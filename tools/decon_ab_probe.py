"""A/B probe: window-level decontamination against a NON-broadcastable
blocklist — the scenario the ``bloom_prefilter`` mode of
``contamination_coverage`` exists for.

Unlike the registry row (benchmark = every 7th doc, keys broadcast), this
makes the reference side deliberately corpus-scale: every 3rd document of
the probed SF is the blocklist, the rest is the training corpus. Three
modes over identical inputs:

- ``broadcast``  — the registry row's plan (explicit broadcast hint); at
  this blocklist size the broadcast itself is the cost being escaped,
- ``shuffled``   — broadcast_bench=False: plain shuffled LeftSemi (both
  sides exchange on wkey),
- ``bloom``      — shuffled + bloom_prefilter=True: fixed-size bitmap
  prefilter so only BF-positive windows reach the exchange.

Each mode reports wall seconds, per-run shuffle-write bytes (UI REST,
executor totals — monotone), and the coverage-row count, which MUST agree
across modes (phase-2 exactness).

Usage: python tools/decon_ab_probe.py <corpus_sf> [reps] [bench_sf]

With a third argument the blocklist comes from a DIFFERENT (smaller) SF
— every 3rd doc of ``bench_sf`` against ALL of ``corpus_sf`` — so the
corpus:blocklist ratio approaches the real decontamination regime
(10³-10⁴:1) instead of the 2.5:1 a single-SF split gives, where the
reference-side bitmap build swamps the corpus-side saving.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_UI", "true")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arrow_parquet_logs_spark.operators.text import contamination_coverage  # noqa: E402
from arrow_parquet_logs_spark.session import get_spark  # noqa: E402
from arrow_parquet_logs_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else ".scale_data/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("decon-ab")
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit("needs the UI for shuffle metrics (SPARK_GRAFT_UI)")

    def shuffle_bytes() -> int:
        import urllib.request

        url = spark.sparkContext.uiWebUrl
        apps = json.load(urllib.request.urlopen(f"{url}/api/v1/applications"))
        execs = json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{apps[0]['id']}/allexecutors"
            )
        )
        return sum(e.get("totalShuffleWrite", 0) for e in execs)

    bench_sf = sys.argv[3] if len(sys.argv) > 3 else None
    docs = load_table(spark, sf, "documents")
    if bench_sf:
        bench = (
            load_table(spark, bench_sf, "documents")
            .where(F.col("doc_id") % 3 == 0)
            .select("text")
        )
        train = docs
    else:
        bench = docs.where(F.col("doc_id") % 3 == 0).select("text")
        train = docs.where(F.col("doc_id") % 3 != 0)

    modes = [
        ("shuffled", dict(broadcast_bench=False)),
        ("bloom", dict(broadcast_bench=False, bloom_prefilter=True)),
        ("broadcast", dict()),
    ]
    # the non-broadcast modes simulate "blocklist too big to broadcast":
    # without this, AQE quietly converts the shuffled semi-join back to a
    # broadcast at test scale and the A/B measures nothing (explicit
    # hints — the bitmap broadcast — still apply at threshold -1)
    thresholds = ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold")
    prev = {k: spark.conf.get(k, None) for k in thresholds}
    counts = {}
    for label, kw in modes:
        for k in thresholds:
            if label == "broadcast":
                if prev[k] is not None:
                    spark.conf.set(k, prev[k])
                else:
                    spark.conf.unset(k)
            else:
                spark.conf.set(k, "-1")
        best, sh = float("inf"), []
        for _ in range(reps):
            s0 = shuffle_bytes()
            t0 = time.perf_counter()
            n = contamination_coverage(train, bench, min_len=10, **kw).count()
            best = min(best, time.perf_counter() - t0)
            sh.append(shuffle_bytes() - s0)
            spark.catalog.clearCache()
        counts[label] = n
        print(
            json.dumps(
                {
                    "mode": label,
                    "sf": sf,
                    "sec": round(best, 3),
                    "shuffle_write_bytes": min(sh),
                    "coverage_rows": n,
                }
            ),
            flush=True,
        )
    assert len(set(counts.values())) == 1, f"modes disagree: {counts}"
    print(json.dumps({"all_modes_equal": True, "coverage_rows": counts["bloom"]}))


if __name__ == "__main__":
    main()
