"""Partitioning guard for Python-worker stages."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_python(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a pandas-UDF stage actually runs in parallel.

    A single small parquet file arrives as ONE input split, which would
    serialize the whole Arrow → pandas stage on one core while the rest of
    the executor pool idles. When the plan has fewer partitions than the
    session's default parallelism, round-robin repartition first — the rows
    are about to cross the JVM↔Python boundary anyway, so the extra exchange
    of the (id, payload) projection is cheap next to the Python work it
    unlocks. At cluster scale (100 TB = tens of thousands of splits) the
    partition count already exceeds ``defaultParallelism`` and this is a
    no-op, adding zero shuffles.

    Per-row transforms are partition-placement-invariant, so results are
    unchanged (pinned by the partition-invariance parity tests).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # df.rdd.getNumPartitions() would be exact, but under AQE merely
    # accessing .rdd materializes every upstream query stage at
    # CONSTRUCTION time (getFinalPhysicalPlan runs jobs) — building a plan
    # must not execute it. inputFiles() walks the plan for file sources
    # without running anything; scan-rooted frames (every caller here) get
    # the right answer, and shuffle-rooted frames conservatively take one
    # extra cheap round-robin exchange.
    try:
        n_inputs = len(df.inputFiles())
    except Exception:
        n_inputs = 0
    if n_inputs < target:
        return df.repartition(target)
    return df
