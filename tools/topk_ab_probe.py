#!/usr/bin/env python
"""In-session A/B for the r8 partial-top-k backport (judge-reproducible).

For each probed row, alternate the NEW form (partial_topk pruning before
the per-query window) with the OLD form (the r7 plan: no pruning — for the
ANN rows an identity patch restores the exact r7 window-over-full-pairs
plan; for kmv the r7 distinct→window build is re-implemented inline),
interleaved reps in ONE session, warm minima reported (the memory-file
measurement rule: single-box noise ±20-40%, only same-session interleaved
minima are comparable).

Usage: python tools/topk_ab_probe.py <sf_dir> [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else ".scale_data/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import SparkSession, Window as W, functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    import arrow_parquet_logs_spark.operators.topk as T
    from arrow_parquet_logs_spark.functions.hashing import hash64
    from arrow_parquet_logs_spark.queries import REGISTRY
    from arrow_parquet_logs_spark.sources.tables import load_table

    real = T.partial_topk

    def identity(df, g, o, k, dedup=False):
        return df

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def kmv_old():
        # the r7 build: corpus DISTINCT shuffle + per-group bottom-k window
        ev = load_table(spark, sf, "events")
        hashed = (
            ev.select("event_type", F.col("user_id").cast("string").alias("_k"))
            .distinct()
            .select("event_type", hash64(F.concat(F.lit("kmv:"), F.col("_k"))).alias("h"))
        )
        w = W.partitionBy("event_type").orderBy("h")
        noop(
            hashed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= 256)
            .groupBy("event_type")
            .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
        )

    rows = [
        "ann_cosine_topk",
        "ann_cosine_topk_pandas",
        "ann_maxsim_late_interaction",
        "embeddings_triplet_margin_audit",
    ]
    out = {}
    for name in rows:
        new_t, old_t = [], []
        for _ in range(reps):
            T.partial_topk = real
            t0 = time.perf_counter()
            noop(REGISTRY[name].fn(spark, sf))
            new_t.append(time.perf_counter() - t0)
            T.partial_topk = identity
            t0 = time.perf_counter()
            noop(REGISTRY[name].fn(spark, sf))
            old_t.append(time.perf_counter() - t0)
        T.partial_topk = real
        out[name] = {"new": round(min(new_t), 2), "old": round(min(old_t), 2),
                     "new_all": [round(x, 1) for x in new_t],
                     "old_all": [round(x, 1) for x in old_t]}
        print(name, out[name], flush=True)
    # kmv: old form is a different BUILD, not an identity patch
    new_t, old_t = [], []
    for _ in range(reps):
        T.partial_topk = real
        t0 = time.perf_counter()
        noop(REGISTRY["events_kmv_type_overlap"].fn(spark, sf))
        new_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        kmv_old()
        old_t.append(time.perf_counter() - t0)
    # note: old side times ONLY the sketch build; new side times the full
    # overlap query — the asymmetry UNDERSTATES the new form's win
    out["kmv_build_old_vs_full_query_new"] = {
        "new": round(min(new_t), 2), "old": round(min(old_t), 2)
    }
    print("events_kmv (new=full query, old=r7 sketch build only):",
          out["kmv_build_old_vs_full_query_new"], flush=True)
    import json

    print(json.dumps({"metric": "topk_ab", "sf": sf, "reps": reps, "rows": out}))


if __name__ == "__main__":
    main()
