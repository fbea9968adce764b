"""Differential harness: Spark query vs DuckDB oracle, strict equality.

Emulates (conservatively) the driver's t2 gate: run both engines over the
same parquet tables, sort columns by name, sort rows, compare values exactly.
If this passes, any order-insensitive value hash passes too.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from arrow_parquet_logs_spark.sources.tables import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(_cell(v) for v in rec) for rec in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    s_pdf = spark_df.toPandas()
    d_pdf = con.sql(sql).df()
    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), (
        f"{name}: column mismatch spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}"
    )
    s_rows, d_rows = canonical_rows(s_pdf), canonical_rows(d_pdf)
    assert len(s_rows) == len(d_rows), f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: first differing row #{i}:\n  spark={a}\n  duck ={b}"
