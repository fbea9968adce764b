"""Partition-count invariance: results must be bit-identical under a hostile
partitioning (shuffle=7, AQE off) — the property that lets one DuckDB oracle
validate an answer computed by 1000 executors. A representative subset runs
here (full sweep is a per-round driver concern); chosen for shuffle-heavy
shapes: windows, multi-join, decimal aggs, pandas stages, set-sim joins."""

from __future__ import annotations

import pytest

from arrow_parquet_logs_spark.queries import REGISTRY
from tests.parity import compare, duck_connect

SUBSET = [
    "tpch_q1",
    "tpch_q5_region_volume",
    "events_sessionization",
    "events_funnel_conversion",
    "events_weekly_retention",
    "events_winsorized_mean",
    "events_value_moments",
    "window_top3_orders_per_customer",
    "dedup_minhash_lsh_fast",
    "docs_bm25_retrieval",
    "docs_repetition_signals",
    "pipeline_training_set",
    "lineitem_price_quantity_corr",
    "full_outer_segment_order_balance",
    # round 2: exact-by-theorem IVF dedup, salted agg (salt values are
    # partition-dependent, the merged result must not be), sharded cumsum
    # packing, sketch bounds gates, TPC-H semi/anti self-join
    "dedup_embedding_cosine",
    "events_salted_type_counts",
    "docs_sequence_packing",
    "events_value_percentiles_approx",
    "tpch_q21_sole_late_supplier",
    # round 4: dHash pigeonhole pairs, integer-grid outlier ranking,
    # prefix-filtered set-sim join, as-of union-and-carry, EWMA lags,
    # decorrelated Q2 self-join, nested-agg Q20 dominance semi
    "multimodal_dhash_dedup",
    "embeddings_outlier_prune",
    "dedup_jaccard_prefix",
    "events_asof_join_operator",
    "events_ewma_value",
    "tpch_q2_min_cost_supplier",
    "tpch_q20_excess_suppliers",
    # round 5: budgeted selection (score-bucket cut + tie window must pick
    # the same documents under any partitioning), recursive CTE frontier
    # joins, manifest-stats pruned read
    "docs_token_budget_selection",
    "sql_recursive_cte",
    "table_stats_pruned_read",
    # round 5 fifth pass: cell-bucketed spatial joins (ring explode + mm-
    # quantized rank), geohash bit codegen, doubling-based cycle labels
    "geo_supplier_radius_join",
    "geo_knn_suppliers",
    "geo_customer_geohash",
    "graph_doc_cycles",
    "events_kmv_type_overlap",
]


@pytest.fixture(scope="module")
def hostile(spark):
    prev = {
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    for k, v in prev.items():
        spark.conf.set(k, v)


@pytest.mark.parametrize("name", SUBSET)
def test_hostile_partitioning_parity(hostile, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(hostile, sf_dir)
    # query constructors repair session confs; force the hostile ones back
    hostile.conf.set("spark.sql.shuffle.partitions", "7")
    hostile.conf.set("spark.sql.adaptive.enabled", "false")
    con = duck_connect(sf_dir)
    compare(df, con, spec.oracle, name=name)
