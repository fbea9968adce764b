"""Arrow IPC stream-file source — migration path for the reference's hot tier.

The reference buffers live rows as ``buffer-%04d.arrow`` IPC stream files
(reference writer.py:281-286) and reads them memory-mapped (reference
reader.py:252-302). Our engine's hot tier is parquet micro-batches, but a
user switching over still has ``.arrow`` buffers on disk; this source reads
them and ``LogStore.import_arrow_buffers`` folds them into the landing tier,
after which normal reads/compaction apply.

Driver-side read is deliberate: buffer files are small by the reference's
own rotation contract (≤10 MB, reference main.py:28) and IPC stream files
are not splittable anyway. The Arrow table crosses into Spark zero-copy-ish
via ``createDataFrame(pa.Table)`` (Arrow-native path, no pandas hop). For a
bulk historical migration of many files, ``import_arrow_buffers`` per
session keeps each conversion bounded.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import pyarrow.ipc as ipc
from pyspark.sql import DataFrame, SparkSession

from arrow_parquet_logs_spark.session import ensure_runtime_confs


def read_arrow_ipc(spark: SparkSession, paths: Iterable[str]) -> DataFrame:
    """Union of one or more Arrow IPC stream files as a DataFrame
    (memory-mapped read, like reference reader.py:270-272)."""
    ensure_runtime_confs(spark)
    tables = []
    for p in paths:
        with pa.memory_map(p) as src:
            tables.append(ipc.open_stream(src).read_all())
    if not tables:
        raise ValueError("no arrow files given")
    return spark.createDataFrame(pa.concat_tables(tables))


def write_arrow_ipc(df_rows: pa.Table, path: str) -> None:
    """Test helper: write a table as an IPC stream file (writer.py:281-286
    format parity)."""
    with ipc.new_stream(path, df_rows.schema) as w:
        for batch in df_rows.to_batches():
            w.write_batch(batch)
