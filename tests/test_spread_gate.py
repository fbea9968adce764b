"""The spread gates must count bin-packed SPLITS, not raw files.

ADVICE r6: Spark packs small files into scan partitions (maxPartitionBytes /
openCostInBytes), so a corpus of many tiny files passes a raw file-count
gate, skips the repartition, and the Python shingler grinds at low
parallelism — the exact defect spread() was added to fix. These tests write
a many-tiny-files corpus whose padded bin-pack estimate collapses to a few
splits and assert both gates still repartition it, and that a frame already
carrying enough splits is left alone (no pure-loss text shuffle).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from arrow_parquet_logs_spark.operators._parallel import (
    estimated_scan_splits,
    spread_for_python,
)
from arrow_parquet_logs_spark.operators.dedup import spread


@pytest.fixture(scope="module")
def tiny_files(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tiny") / "docs.parquet")
    # ~64 tiny files: raw file count beats any local parallelism target,
    # but padded bin-packing collapses them to ~ceil(64*4MB/128MB) = 2 splits
    (
        spark.range(256)
        .select(F.col("id").alias("doc_id"), F.lit("text body").alias("text"))
        .repartition(64)
        .write.mode("overwrite")
        .parquet(out)
    )
    df = spark.read.parquet(out)
    assert len(df.inputFiles()) >= 40  # many more files than any local target
    return df


def test_estimated_splits_sees_through_bin_packing(tiny_files):
    est = estimated_scan_splits(tiny_files)
    assert est < 8, f"64 tiny files must estimate to a few packed splits, got {est}"


def test_spread_repartitions_bin_packed_tiny_files(spark, tiny_files):
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    plan = spread(tiny_files, "doc_id")._jdf.queryExecution().toString()
    assert "Exchange" in plan or "RoundRobin" in plan or "hashpartitioning" in plan, (
        "spread() must repartition a bin-packed tiny-file corpus"
    )
    assert spread(tiny_files, "doc_id").rdd.getNumPartitions() == n


def test_spread_for_python_repartitions_bin_packed_tiny_files(spark, tiny_files):
    target = spark.sparkContext.defaultParallelism
    assert spread_for_python(tiny_files).rdd.getNumPartitions() >= min(target, 8)


def test_estimated_splits_unquotes_percent_encoded_paths(spark, tmp_path):
    """ADVICE r7: inputFiles() returns percent-encoded URIs; a path with a
    space must still stat (estimate collapses), not silently fall back to
    the raw file count and reopen the bin-packing blind spot."""
    out = str(tmp_path / "dir with space" / "docs.parquet")
    (
        spark.range(64)
        .select(F.col("id").alias("doc_id"))
        .repartition(16)
        .write.mode("overwrite")
        .parquet(out)
    )
    df = spark.read.parquet(out)
    assert any("%20" in f or " " in f for f in df.inputFiles())
    est = estimated_scan_splits(df)
    assert est < 8, f"16 tiny files in an encoded path must bin-pack, got {est}"


def test_spread_noop_on_wide_scan(spark, tiny_files):
    # a frame whose ESTIMATE already exceeds the session parallelism is
    # left untouched: force the estimate up via a tiny maxPartitionBytes
    prev_m = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_o = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    spark.conf.set("spark.sql.files.openCostInBytes", "16384")
    try:
        df = spark.read.parquet(tiny_files.inputFiles()[0].rsplit("/", 1)[0])
        est = estimated_scan_splits(df)
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert est >= n
        assert spread(df, "doc_id") is df, "wide scan must not re-shuffle"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_m)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_o)


def test_row_group_cap_extrapolates_past_512_files(spark, tmp_path):
    """VERDICT r8 #3: >512 local files must NOT silently drop the
    row-group cap. 600 single-row-group files with a tiny
    maxPartitionBytes make the byte estimate huge; the sampled-footer
    extrapolation must pull it back to ~600 (one row-bearing task per
    row group)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "many"
    d.mkdir()
    tbl = pa.table({"doc_id": list(range(500)), "text": ["x" * 100] * 500})
    for i in range(600):
        pq.write_table(tbl, str(d / f"f{i:04d}.parquet"))  # one row group each
    df = spark.read.parquet(str(d))
    assert len(df.inputFiles()) == 600
    prev_m = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_o = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        est = estimated_scan_splits(df)
        # byte arithmetic alone says total/2KB (thousands); the sampled
        # footer cap must bring the estimate to the true task bound
        assert est == 600, f"expected the 600-row-group cap, got {est}"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_m)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_o)


def test_row_group_cap_robust_to_compacted_outlier(spark, tmp_path):
    """ADVICE r10: on a >512-file corpus that is mostly single-row-group
    files, ONE sampled compacted multi-group file must not inflate the
    extrapolated cap until it never binds (max-based extrapolation would
    return 8×n_files here and the byte-estimate over-split would come
    back). p90 of the sampled counts discards the outlier: the cap stays
    at the true ~600 row-bearing tasks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "mostly_single"
    d.mkdir()
    tbl = pa.table({"doc_id": list(range(500)), "text": ["x" * 100] * 500})
    # f0000 sorts first so the evenly-spaced sample (index 0) always hits it
    pq.write_table(tbl, str(d / "f0000.parquet"), row_group_size=64)  # 8 groups
    for i in range(1, 600):
        pq.write_table(tbl, str(d / f"f{i:04d}.parquet"))  # one row group each
    df = spark.read.parquet(str(d))
    prev_m = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_o = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        est = estimated_scan_splits(df)
        assert est == 600, f"outlier must not disable the cap, got {est}"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_m)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_o)


def test_footer_reads_are_memoized(spark, tiny_files, monkeypatch):
    """ADVICE r8: repeated gates on the same corpus must pay the footer
    reads once per (path, mtime, size), not once per call."""
    from arrow_parquet_logs_spark.operators import _parallel as P

    P._RG_FOOTER_CACHE.clear()
    import pyarrow.parquet as pq

    opens = []
    orig = pq.ParquetFile

    def _spy(path, *a, **k):
        opens.append(path)
        return orig(path, *a, **k)

    monkeypatch.setattr(pq, "ParquetFile", _spy)
    estimated_scan_splits(tiny_files)
    first = len(opens)
    estimated_scan_splits(tiny_files)
    assert len(opens) == first, "second estimate must be served from the cache"


def test_provably_small_scan_byte_bound(spark, tmp_path, tiny_files):
    """ADVICE r8 (skyline): few-split is NOT small when the bytes are big —
    a 1–2 row-group giant file must stay on the distributed plan."""
    from arrow_parquet_logs_spark.operators._parallel import provably_small_scan

    out = str(tmp_path / "one.parquet")
    spark.range(512).select(F.col("id").alias("doc_id")).coalesce(1).write.parquet(out)
    df = spark.read.parquet(out)
    assert provably_small_scan(df), "a genuinely tiny single-file scan is small"
    assert not provably_small_scan(df, max_bytes=64), (
        "the byte bound must veto a few-split frame whose bytes exceed it"
    )
    # many-split frames are never 'provably small'
    assert not provably_small_scan(tiny_files, max_splits=0)
