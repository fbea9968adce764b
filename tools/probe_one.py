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
    args = ap.parse_args()

    from arrow_parquet_logs_spark.queries import REGISTRY
    from arrow_parquet_logs_spark.session import get_spark

    spark = get_spark("probe-one")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()

    fn = REGISTRY[args.query].fn
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(json.dumps({"query": args.query, "sf": args.sf, "sec": round(best, 3)}))


if __name__ == "__main__":
    main()
