#!/usr/bin/env python
"""Per-job breakdown of ONE registry query (UI REST): where a multi-job
operator (fit → materialize → search → gate) actually spends its wall time.

    SPARK_GRAFT_UI=true python tools/profile_jobs.py --query ann_ivfpq_search \
        --sf /root/testdata/sf0.1 [--warm 2]

Warm-up protocol matches bench.py (JVM, python workers, one warm run at the
target SF so janino codegen isn't billed), then one measured run; per-job
rows come from /api/v1/applications/<id>/jobs restricted to the measured
window. Job names are truncated SQL descriptions — label phases in the
operator with setJobDescription for readable output.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    from arrow_parquet_logs_spark.queries import REGISTRY
    from arrow_parquet_logs_spark.session import get_spark

    spark = get_spark("profile-jobs")
    ui = spark.sparkContext.uiWebUrl
    if ui is None:
        raise SystemExit("UI disabled; run with SPARK_GRAFT_UI=true")
    app_id = spark.sparkContext.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()

    fn = REGISTRY[args.query].fn
    for _ in range(args.warm):
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    spark.range(1).count()

    def jobs() -> list[dict]:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
            return json.load(r)

    seen = {j["jobId"] for j in jobs()}
    t0 = time.perf_counter()
    fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    new = sorted((j for j in jobs() if j["jobId"] not in seen), key=lambda j: j["jobId"])
    total_job = 0.0
    print(f"query={args.query} wall={wall:.3f}s jobs={len(new)}")
    for j in new:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
        dur = (
            datetime.strptime(j["completionTime"], fmt)
            - datetime.strptime(j["submissionTime"], fmt)
        ).total_seconds()
        total_job += dur
        name = (j.get("description") or j.get("name") or "")[:110].replace("\n", " ")
        print(f"  job {j['jobId']:>4} {dur:7.3f}s tasks={j['numCompletedTasks']:>4} {name}")
    print(f"  sum(job durations)={total_job:.3f}s (gaps = driver-side work: {wall - total_job:.3f}s)")


if __name__ == "__main__":
    main()
