"""Mergeable frequency sketches — Count-Min.

A Count-Min sketch (Cormode & Muthukrishnan 2005) summarizes a key-frequency
distribution in a fixed depth×width counter table: each key increments one
counter per row (row-seeded hash), and a point estimate is the MIN over its
depth counters — always ≥ the true count, with overestimate bounded by
ε·N (ε = e/width) at probability 1−δ (δ = e^-depth).

Why it earns a place next to exact groupBy counts: the sketch is
FIXED-SIZE and MERGEABLE (cell-wise addition), so at 100 TB the frequency
summary of any substream — per hour, per shard, per source — is depth×width
integers that combine associatively, where the exact answer is an
unbounded-cardinality shuffle. The complement to the Misra-Gries heavy
hitters in streaming/stateful.py: MG keeps the top-k identities, CMS
answers point queries for ANY key after the fact.

Everything is Catalyst expressions over the portable md5-derived hash64
(functions/hashing.py), so the whole sketch — hashes included — replays
bit-for-bit in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from arrow_parquet_logs_spark.functions.hashing import hash64


def _cms_bucket(key: Column, row: Column, width: int) -> Column:
    """Row-seeded bucket: hash64(key '#' row) mod width — hash64 is
    non-negative (60-bit), so ``%`` behaves identically in both engines."""
    return hash64(F.concat(key, F.lit("#"), row.cast("string"))) % width


def count_min_counters(df: DataFrame, key_col: str, depth: int = 4,
                       width: int = 256) -> DataFrame:
    """Build the (row, bucket, cnt) counter table for ``key_col``.

    One explode (depth× fan-out, map-side) + one aggregation on the
    (row, bucket) pair — at most depth·width output rows regardless of
    input cardinality. Counter tables from disjoint substreams merge by
    summing cnt per (row, bucket); `test_operators` pins merge ≡ rebuild.
    """
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    keyed = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    return (
        keyed.select("row", _cms_bucket(F.col("k"), F.col("row"), width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(probes: DataFrame, counters: DataFrame, key_col: str,
                       depth: int = 4, width: int = 256) -> DataFrame:
    """Point-estimate frequencies for ``probes[key_col]`` against a counter
    table: min over the key's depth counters, 0 when a bucket was never
    touched (key certainly absent). The probe side fans out depth× and
    joins the ≤ depth·width counter table — broadcast-sized by
    construction, so the estimate join never shuffles the counters."""
    p = probes.select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).withColumn("bucket", _cms_bucket(F.col("k"), F.col("row"), width))
    joined = p.join(F.broadcast(counters), ["row", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )
