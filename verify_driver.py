"""Driver-contract verifier — emulates the round driver from a fresh process.

Run:  SPARK_GRAFT_CPUS=8 python verify_driver.py [--sf /root/testdata/sf0.01]
                                                 [--log VERIFY_rN.log]

1. Builds a VANILLA SparkSession (non-UTC tz, default confs) — exactly what
   the real driver does; `ensure_runtime_confs` must repair it.
2. entry(spark).collect() -> rows > 0.
3. Every queries()[name] vs oracle_sql()[name] in DuckDB: sorted-column,
   sorted-row sha256 value-hash must match (driver t2 gate, strict form).

The log is SELF-VERIFYING: per-query result lines are written to the
``--log`` file from inside this script (never tee'd terminal output, which
carriage-return progress bars can swallow), and the footer is emitted only
after asserting written-line count == query count — a log whose summary
can't disagree with its evidence lines.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
import traceback


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--log", default=None, help="self-verifying per-query logfile")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("verify-driver")
        .config("spark.sql.session.timeZone", "America/New_York")  # hostile tz
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as e
    from tests.parity import compare, duck_connect

    log_fh = open(args.log, "w", encoding="utf-8") if args.log else None

    def log(line: str) -> None:
        print(line, flush=True)
        if log_fh:
            log_fh.write(line + "\n")
            log_fh.flush()

    t0 = time.time()
    n = len(e.entry(spark).collect())
    assert n > 0, "entry() returned 0 rows"
    log(f"# entry(): {n} rows in {time.time() - t0:.1f}s")

    queries = e.queries()
    oracles = e.oracle_sql()
    if args.only:
        keep = set(args.only.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}

    con = duck_connect(args.sf)
    failed, rows_only, written = [], [], 0
    for i, (name, fn) in enumerate(sorted(queries.items())):
        t0 = time.time()
        try:
            df = fn(spark, args.sf)
            if name in oracles:
                compare(df, con, oracles[name], name=name)  # raises on mismatch
                status = "OK"
            else:
                nr = len(df.collect())
                status = f"rows-only ({nr} rows)"
                rows_only.append(name)
        except Exception:
            status = "ERROR"
            failed.append((name, traceback.format_exc(limit=5)))
        log(f"[{i + 1}/{len(queries)}] {name}: {status} ({time.time() - t0:.1f}s)")
        written += 1

    # the footer must not be able to overstate the evidence: every query
    # needs its own line in the file before we claim a total
    assert written == len(queries), (
        f"log incomplete: {written} per-query lines for {len(queries)} queries"
    )
    if log_fh:
        log_fh.flush()
        with open(args.log, encoding="utf-8") as fh:
            evidence = [ln for ln in fh if ln.startswith("[")]
        assert len(evidence) == len(queries), (
            f"logfile incomplete: {len(evidence)} evidence lines for "
            f"{len(queries)} queries"
        )
    log(f"\n{len(queries) - len(failed)}/{len(queries)} green "
        f"({len(rows_only)} rows-only: {', '.join(rows_only)})")
    if failed:
        log("FAILED:")
        for name, msg in failed:
            log(f"  {name}: {msg[:500]}")
        if log_fh:
            log_fh.close()
        return 1
    if log_fh:
        log_fh.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
