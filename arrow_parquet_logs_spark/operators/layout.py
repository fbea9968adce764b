"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB, scans win or lose on how many parquet row groups a predicate can
skip via min/max statistics. A sort on one column gives perfect skipping on
that column and none on any other; interleaving the bits of several columns
(the Morton / Z-order curve — the same layout OPTIMIZE ZORDER BY gives in
lakehouse engines) keeps every clustered column's values locally narrow, so
multi-dimensional predicates prune on all of them at once.

The curve code is pure codegen bit arithmetic (shifts + masks, no UDF); the
rewrite is one range-partitioned sort — exactly the shape of a periodic
OPTIMIZE job over an archive partition.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def scale_to_bits(col: Column, lo: Column | float, hi: Column | float, bits: int) -> Column:
    """Affinely map ``col`` from [lo, hi] onto the integer grid [0, 2^bits).

    lo/hi come from a one-row stats pass (parquet footers make it metadata-
    cheap); values outside clamp to the grid edges so stale bounds degrade
    locality, never correctness.
    """
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    span = F.when(hi_c > lo_c, hi_c - lo_c).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo_c) / span
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(clamped * F.lit(float(1 << bits))).cast("bigint"), top)


def morton_code(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already grid-scaled)
    column: column j contributes its bit i at output position
    ``i * n_cols + j``. 64-bit output, so ``bits * len(cols) <= 63``.
    Pure shift/mask expressions — whole-stage codegen, no Python."""
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError(f"bits*cols = {n * bits} must fit a signed 64-bit code")
    parts = []
    for j, c in enumerate(cols):
        c = c.cast("bigint")
        for i in range(bits):
            # (c >> i & 1) << (i*n + j)  — via expr: column shift amounts
            parts.append(F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    target_files: int | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``df`` in Z-order along ``cols`` (numeric columns).

    One tiny stats pass finds per-column bounds, then a single
    range-partition + in-partition sort on the interleaved code produces
    files whose min/max envelopes are tight on EVERY clustered column.
    ``target_files`` sizes the output (defaults to the session's shuffle
    partitioning); at scale run per archive partition as the compaction
    step, like LogStore.compact does for time.

    ``partition_cols`` lead the range partitioning and the in-partition
    sort: when the caller will ``write.partitionBy`` those columns, this
    aligns tasks with partition-directory boundaries so each task writes
    into ~one directory (without it, every task can straddle every
    directory and file counts multiply by the partition count).
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    if any(stats[f"lo_{c}"] is None for c in cols):
        # empty input (or an all-NULL column): nothing to cluster — return
        # as-is instead of crashing on float(None) in the scale expressions
        return df
    scaled = [
        scale_to_bits(F.col(c), stats[f"lo_{c}"], stats[f"hi_{c}"], bits) for c in cols
    ]
    code = morton_code(scaled, bits)
    out = df.withColumn("__z", code)
    pcols = list(partition_cols or [])
    if target_files:
        out = out.repartitionByRange(target_files, *pcols, "__z")
    else:
        out = out.repartitionByRange(*pcols, "__z")
    return out.sortWithinPartitions(*pcols, "__z").drop("__z")
