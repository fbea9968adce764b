#!/usr/bin/env python
"""Time ONE registry query at ONE sf dir, isolated — the box-day A/B unit.

Same discipline as scale_bench.py (JVM + codegen + python-worker warm-up,
noop sink, min of --reps) but importable against any checkout: run it from
a worktree to time the same query on the same data under a different
commit before calling anything a regression (SCALING.md box-day method).

    python tools/probe_one.py --query ann_binary_quantized_rerank \
        --sf /root/repo/.scale_data/sf1 --reps 2
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--sf", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--shuffle", action="store_true",
        help="also report per-run shuffle-write bytes (UI REST delta)",
    )
    args = ap.parse_args()

    from arrow_parquet_logs_spark.queries import REGISTRY
    from arrow_parquet_logs_spark.session import get_spark

    if args.shuffle:
        # the session factory disables the UI by default; the REST
        # shuffle-byte counter needs it (must precede session creation)
        os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark("probe-one")
    if args.shuffle and spark.sparkContext.uiWebUrl is None:
        raise SystemExit("--shuffle needs the UI; session already built without it")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()

    def shuffle_bytes() -> int:
        """Cumulative shuffle-write bytes of this app (UI REST; the delta
        around a run is that run's shuffle volume). Summed from EXECUTOR
        totals, not the stage list: stage entries are evicted past
        spark.ui.retainedStages (a long multi-rep probe would silently
        under-count or go negative) while executor counters are monotone
        for the app's lifetime."""
        import urllib.request

        url = spark.sparkContext.uiWebUrl
        apps = json.load(urllib.request.urlopen(f"{url}/api/v1/applications"))
        execs = json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{apps[0]['id']}/allexecutors"
            )
        )
        return sum(e.get("totalShuffleWrite", 0) for e in execs)

    fn = REGISTRY[args.query].fn
    best = float("inf")
    per_run_shuffle = []
    for _ in range(args.reps):
        s0 = shuffle_bytes() if args.shuffle else 0
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        if args.shuffle:
            per_run_shuffle.append(shuffle_bytes() - s0)
        spark.catalog.clearCache()
    out = {"query": args.query, "sf": args.sf, "sec": round(best, 3)}
    if args.shuffle:
        out["shuffle_write_bytes"] = min(per_run_shuffle)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
