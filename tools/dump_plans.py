#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to files.

    python tools/dump_plans.py --out plans/r11 --suffix _before \
        --sf /root/testdata/sf0.1 [--queries a,b,c | --bench]

Plan-only (no execution): builds each query's DataFrame and writes the
formatted physical plan. With AQE on the dump shows the initial plan
(isFinalPlan=false) — good enough for Exchange/join/pushdown shape checks.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default="")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    from arrow_parquet_logs_spark.plans.inspect import explain_str
    from arrow_parquet_logs_spark.queries import REGISTRY, bench_queries
    from arrow_parquet_logs_spark.session import get_spark

    names: list[str] = []
    if args.bench:
        names += sorted(bench_queries())
    if args.queries:
        names += [q.strip() for q in args.queries.split(",") if q.strip()]
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in names:
        fn = REGISTRY[name].fn
        try:
            plan = explain_str(fn(spark, args.sf))
        except Exception as exc:  # noqa: BLE001 — record the failure, keep going
            plan = f"<explain failed: {exc!r}>"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
