#!/usr/bin/env python
"""Empirical scaling probe: the same queries at sf0.1 and sf1 (10x rows).

Every performance number through round 4 was measured at sf0.1; the 100x
design story rested on plan-shape audits alone. This runs the headline
risk classes at two scales and records wall-time growth:

- TPC-H aggregation / fact-fact joins (q1, q9, q21, q5),
- LSH candidate generation (`dedup_minhash_lsh_fast`) and the df-capped
  shingle join (`dedup_ngram_jaccard_fast`) — the #1 super-linear risk:
  candidate pairs grow with collision density, not input rows,
- duplicate clustering over LSH pairs (`dedup_clusters`),
- embedding near-dup via IVF cells (`dedup_embedding_cosine_fast`),
- IVF-PQ split into BUILD (one-time: fit + encode + materialize) and
  SEARCH (recurring: pruned ADC + rerank) — the recurring cost is what a
  deployment pays per query,
- the linear text pipeline (`pipeline_training_set`), sessionization
  window, token wordcount, and the LogStore ingest→compact cycle.

sf1 data comes from tools/gen_scale_data.py (same schemas/distributions
as the driver's sf0.1, measured; 10x rows; deterministic). Timing: min of
``--reps`` end-to-end runs per (query, sf), forced through the noop sink;
same JVM/codegen/python-worker warm-up discipline as bench.py.

Output: one JSON line; driver-committed copy in SCALE_r05.json. A query
"scales" if time(sf1)/time(sf0.1) stays near the data ratio (10x) — well
below it when a fixed per-job cost still dominates at sf0.1, which is why
the ratios here are mostly ~1-4x; well above it means a super-linear
stage (the thing this probe exists to catch)."""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "tpch_q1",
    "tpch_q5_region_volume",
    "tpch_q9_product_profit",
    "tpch_q21_sole_late_supplier",
    "dedup_minhash_lsh_fast",
    "dedup_ngram_jaccard_fast",
    "dedup_clusters",
    "dedup_embedding_cosine_fast",
    "pipeline_training_set",
    "events_sessionization",
    "docs_token_freq",
    "dedup_edit_distance",
    "graph_pagerank_trade",
    # round-5 third pass: the new operator families' risk classes —
    # adjacency-intersection triangles (the rewritten wedge bottleneck),
    # frontier BFS (settled-set growth), the declarative 2-criteria
    # skyline and the SFS d-criteria regime (frontier-bounded work),
    # filtered ANN (predicate-pushed exact regime), association lift
    # (per-doc pair fan-out), and the screen suite's shared shape (one
    # rollup + keys-sized math) via its heaviest member.
    "graph_triangle_count",
    "graph_shortest_hops",
    "part_skyline_price_size",
    "lineitem_skyline_3d",
    "ann_filtered_topk",
    "docs_token_lift",
    "events_robust_outliers",
    "graph_kcore_trade",
    "graph_cheapest_hops",
    "docs_phrase_search",
    "linkage_customer_names",
    # round-8: the partial-top-k backport's touched rows — every per-query
    # ranker now prunes per-partition before its window (operators/topk.py)
    "ann_cosine_topk",
    "ann_cosine_topk_pandas",
    "ann_maxsim_late_interaction",
    "ann_maxsim_rerank",
    "ann_ivfpq_search",
    "ann_ivfpq_maxsim_rerank",
    "embeddings_pq_adc",
    "embeddings_triplet_margin_audit",
    "events_kmv_type_overlap",
    # round-8 second pass: the three new surface rows — the rerank's one
    # corpus scan + pruned windows, the zero-shuffle codegen classifier,
    # and the (overhead-dominated) streaming maintenance loop
    "docs_cross_encoder_rerank",
    "docs_hashed_linear_quality",
    "ann_ivfpq_stream_maintained",
    "embeddings_matryoshka_recall",
    "events_cuped_adjusted_lift",
    # round-9/10 rows: the CDC ingest-dedup pipeline (merge feed, and the
    # r10 persistent cluster maintenance on top of it), the BQ shortlist
    # + its r10 centered-recall audit, and the streaming experiment MVs
    "dedup_lsh_cdc_merge",
    "dedup_cdc_cluster_maintain",
    "ann_binary_quantized_rerank",
    "ann_bq_centered_recall_audit",
    "events_stream_cuped",
    "events_cuped_sequential_test",
    "events_stream_sequential_decision",
    "docs_exact_substring_dedup",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _ivfpq_parts(spark, sf_dir: str):
    """(build_fn, search_fn) over a shared index path — separates the
    one-time index construction from the recurring search."""
    from pyspark.sql import functions as F

    from arrow_parquet_logs_spark.operators import pq as PQ
    from arrow_parquet_logs_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    # the query's corpus-scaled recall knobs (queries/vectorq.py): timings
    # reflect PRODUCTION settings at each SF, not a fixed-work scan
    n = emb.count()
    ks = 16 if n < 5_000 else 64
    rerank = max(50, n // 100)
    state: dict = {}

    def build() -> None:
        state["path"] = tempfile.mkdtemp(prefix="scale_ivfpq_") + "/idx"
        state["cents"], state["books"] = PQ.fit_ivfpq(emb, ks=ks)
        PQ.materialize_ivfpq(emb, state["cents"], state["books"], state["path"])

    def search() -> None:
        _noop(
            PQ.search_ivfpq(
                spark, state["path"], emb, q, state["cents"], state["books"],
                k=5, nprobe=4, rerank=rerank,
            )
        )

    return build, search


def run_sf(spark, sf_dir: str, reps: int, only: set[str] | None = None) -> dict[str, float]:
    from arrow_parquet_logs_spark.queries import REGISTRY
    from bench import _logstore_cycle

    timings: dict[str, float] = {}

    def _settle() -> None:
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.range(1).count()

    for name in QUERIES:
        if only and name not in only:
            continue
        fn = REGISTRY[name].fn
        timings[name] = _time(lambda: _noop(fn(spark, sf_dir)), reps)
        _settle()
    if not only or "ann_ivfpq" in only:
        build, search = _ivfpq_parts(spark, sf_dir)
        timings["ann_ivfpq_build"] = _time(build, reps)
        timings["ann_ivfpq_search_only"] = _time(search, reps)
        _settle()
    if only and "embedding_cosine_tight" in only:
        # embedding near-dup at the production threshold (t >= 0.85).
        # CAVEAT (measured at sf10 — SCALING.md "isotropic noise"): this
        # synthetic corpus is near-isotropic, so the ε-complete ring holds
        # almost all √N cells and EXACT dedup stays near-quadratic no
        # matter the sizing — prune-ability requires duplicate STRUCTURE,
        # which real corpora have and this generator does not. Kept as an
        # opt-in row for clustered data; not part of the standard sf10 set
        # (the approximate IVF-PQ rows cover the vector path there).
        from pyspark.sql import functions as _F

        from arrow_parquet_logs_spark.operators.dedup import embedding_dup_pairs_fast
        from arrow_parquet_logs_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        timings["embedding_cosine_tight"] = _time(
            lambda: _noop(embedding_dup_pairs_fast(emb, threshold=0.9)), reps
        )
        _settle()
    if not only or "logstore_cycle" in only:
        # ingest volume scales with the SF dir (20k rows at sf0.1)
        sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        n_rows = int(20_000 * (float(sf_tag) / 0.1)) if sf_tag else 20_000
        timings["logstore_cycle"] = round(
            min(_logstore_cycle(spark, sf_dir, n_rows=n_rows) for _ in range(reps)), 3
        )
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", nargs="+", default=["/root/testdata/sf0.1", ".scale_data/sf1"])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated query subset")
    args = ap.parse_args()

    from arrow_parquet_logs_spark.session import get_spark

    spark = get_spark("scale-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()

    results: dict[str, dict[str, float]] = {}
    for sf_dir in args.sfs:
        tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        only = set(args.only.split(",")) if args.only else None
        results[tag] = run_sf(spark, sf_dir, args.reps, only=only)

    tags = list(results)
    out = {"metric": "scale_probe", "unit": "sec", "reps": args.reps, "sfs": results}
    if len(tags) == 2:
        a, b = tags
        out["ratios"] = {
            q: (round(results[b][q] / results[a][q], 2) if results[a][q] > 0 else None)
            for q in results[a]
        }
        out["data_ratio"] = round(float(b) / float(a), 1)
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
