#!/usr/bin/env python
"""Headline benchmark: runs the bench-tagged registry queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full physical plan —
scan, shuffles, windows — without driver-side collect skew). One tiny
warm-up action first so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from arrow_parquet_logs_spark.queries import bench_queries
    from arrow_parquet_logs_spark.session import get_spark

    spark = get_spark("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    timings: dict[str, float] = {}
    for name, fn in sorted(bench_queries().items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "bench_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
