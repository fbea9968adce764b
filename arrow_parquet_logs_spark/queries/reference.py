"""Reference-workload queries: the log-server surface over the ``events`` table.

``events`` is the driver's analog of the reference's log table (timestamped
rows + a level-like ``event_type`` + a session-like ``user_id``). Each query
here maps one reference operator family (SURVEY.md §2.1-§2.8) onto idiomatic
DataFrame code, with a DuckDB oracle:

- S1/S2 parquet scan + F1/F3 pushdown time-range filter (inclusive bounds,
  reference reader.py:469-472),
- A1-A3 filtered counts, A4 summary stats,
- U1 two-tier UNION ALL read (reference reader.py:488-510),
- O1-O2 ordering / top-k (tail-the-log),
- F1/F4 the (col, op, val) filter-triple compiler path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.logstore.filters import compile_filters
from arrow_parquet_logs_spark.functions.numeric import dsum, davg
from arrow_parquet_logs_spark.queries.catalog import register, scratch_dir
from arrow_parquet_logs_spark.sources.tables import load_events_range, load_table

_T0 = "2024-01-05 00:00:00"
_T1 = "2024-01-12 00:00:00"
_SPLIT = "2024-01-20 00:00:00"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "logs_ts_range_scan",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '{_T0}' AND ts <= TIMESTAMP '{_T1}'
    ORDER BY ts, event_id
    """,
    tags=("scan", "filter", "reference-parity"),
    bench=True,
)
def logs_ts_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range scan, inclusive on both ends (reference reader.py:469-472).

    The range predicate reaches the parquet scan (PushedFilters) so row
    groups outside [T0, T1] are skipped via min/max statistics — the Spark
    equivalent of the reference's ds.Expression pushdown (reader.py:29-59).
    load_events_range pushes on the raw ns column (a filter on the derived
    µs timestamp would not push at all).
    """
    ev = load_events_range(spark, sf_dir, _T0, _T1)
    return ev.select("event_id", "ts", "user_id", "event_type", "value").orderBy("ts", "event_id")


@register(
    "logs_filtered_count",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    WHERE event_type = 'error' AND ts >= TIMESTAMP '{_T0}' AND ts <= TIMESTAMP '{_T1}'
    """,
    tags=("agg", "reference-parity"),
)
def logs_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered count (reference reader.py:181-206): count pushes no data —
    only row-group metadata + residual filter evaluation."""
    ev = load_events_range(spark, sf_dir, _T0, _T1)
    return ev.where(F.col("event_type") == "error").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "logs_two_tier_union",
    oracle=f"""
    SELECT event_id, ts, event_type FROM events
    WHERE ts < TIMESTAMP '{_SPLIT}' AND event_type = 'error'
    UNION ALL
    SELECT event_id, ts, event_type FROM events
    WHERE ts >= TIMESTAMP '{_SPLIT}' AND event_type = 'error'
    """,
    tags=("union", "reference-parity"),
)
def logs_two_tier_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive ∪ buffer two-tier read (reference reader.py:488-510): UNION ALL
    of the cold slice and the hot slice with the same residual filter. In the
    LogStore this is landing ∪ archive; here the split is simulated by time.
    Each side gets a pushed ns-range superset filter plus the exact residual."""
    cold = (
        load_events_range(spark, sf_dir, end=_SPLIT)
        .where(F.col("ts") < _ts(_SPLIT))
        .select("event_id", "ts", "event_type")
    )
    hot = load_events_range(spark, sf_dir, start=_SPLIT).select("event_id", "ts", "event_type")
    return cold.unionByName(hot).where(F.col("event_type") == "error")


@register(
    "logs_summary_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS avg_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "reference-parity"),
)
def logs_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-level summary (reference reader.py:560-577 generalized to group-by,
    which the reference lacks entirely — SURVEY.md §2.4)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            dsum(F.col("value"), "sum_value", 12, 2),
            davg(F.col("value"), "avg_value", 12, 2),
        )
        .orderBy("event_type")
    )


@register(
    "logs_tail_topk",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 20
    """,
    tags=("topk", "reference-parity"),
)
def logs_tail_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-the-log: top-k newest rows. Spark plans TakeOrderedAndProject —
    per-partition heap + driver merge, no global sort at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    ).limit(20)


@register(
    "logs_distinct_levels",
    oracle="SELECT DISTINCT event_type FROM events ORDER BY event_type",
    tags=("distinct", "reference-parity"),
)
def logs_distinct_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type").distinct().orderBy("event_type")


@register(
    "logstore_roundtrip",
    oracle=f"""
    SELECT event_type AS level,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM events
    WHERE event_id < 2000 AND ts >= TIMESTAMP '{_T0}'
    GROUP BY event_type ORDER BY level
    """,
    tags=("logstore", "reference-parity", "end-to-end"),
)
def logstore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LogStore itself, oracle-checked end to end: ingest a
    deterministic slice of events as log rows (strict-validated Arrow
    writes), compact (manifest swap), then read back through the two-tier
    union with an inclusive time filter and aggregate. If any stage —
    validation, µs truncation, landing write, compaction rewrite, manifest
    exclusion, range read — dropped or duplicated a row, the hash would
    not match plain SQL over the source table."""

    from arrow_parquet_logs_spark.logstore import LogStore
    from arrow_parquet_logs_spark.sources.tables import load_events_range

    rows = (
        load_events_range(spark, sf_dir)
        .where(F.col("event_id") < 2000)
        .select(
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("timestamp"),
            F.col("event_type").alias("level"),
            F.col("props").alias("message"),
        )
        .collect()
    )
    store = LogStore(spark, scratch_dir(prefix="logstore_roundtrip_"))
    batch = [r.asDict() for r in rows]
    third = max(1, len(batch) // 3)
    store.write_logs("bench", "s1", batch[:third])
    store.write_logs("bench", "s1", batch[third : 2 * third])
    store.compact("bench", "s1")  # first two batches → archive tier
    store.write_logs("bench", "s1", batch[2 * third :])  # landing tier
    return (
        store.read_df(container="bench", session="s1", start_ts=_T0, ordered=False)
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("timestamp").alias("first_ts"),
            F.max("timestamp").alias("last_ts"),
        )
        .orderBy("level")
    )


@register(
    "logs_filter_compiler",
    oracle=f"""
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE event_type != 'view' AND value >= 50.0 AND value < 250.0
      AND ts >= TIMESTAMP '{_T0}'
    ORDER BY event_id
    """,
    tags=("filter", "reference-parity"),
)
def logs_filter_compiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (col, op, val) triple compiler (reference reader.py:29-86) feeding
    a scan — one compilation, Catalyst decides pushdown vs residual. The
    time bound additionally rides the pushdown-capable raw-ns path (the
    compiled ts triple stays as the exact residual)."""
    ev = load_events_range(spark, sf_dir, start=_T0)
    pred = compile_filters(
        [
            ("event_type", "!=", "view"),
            ("value", ">=", 50.0),
            ("value", "<", 250.0),
            ("ts", ">=", _T0),
        ]
    )
    return ev.where(pred).select("event_id", "ts", "event_type", "value").orderBy("event_id")


@register(
    "table_merge_upsert",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
    ),
    ins AS (
        SELECT -(c_custkey + 1) AS c_custkey,
               concat('new_', CAST(c_custkey AS VARCHAR)) AS c_name,
               c_nationkey, 42.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 97 = 0
    ),
    merged AS (
        SELECT c_custkey, c_name, c_nationkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 != 0
        UNION ALL SELECT * FROM upd
        UNION ALL SELECT * FROM ins
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM merged WHERE NOT (c_acctbal < 100.0)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("merge", "upsert", "versioned-table"),
)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE + DELETE through the VersionedTable commit protocol, end to
    end under the hash gate: snapshot customer into a segment-partitioned
    versioned table, MERGE an update set (matched keys replaced, new keys
    inserted — only touched partitions rewritten, the rest carried by file
    reference), DELETE low-balance rows (the takedown path), then read
    CURRENT and aggregate. The oracle replays the same merge semantics as
    pure SQL over the base table — the physical protocol (manifests,
    CURRENT swap, carried files) must be invisible in the result."""
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment",
    )
    root = scratch_dir(prefix="merge_upsert_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        updates = cust.where(F.col("c_custkey") % 10 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
        )
        inserts = cust.where(F.col("c_custkey") % 97 == 0).select(
            (-(F.col("c_custkey") + 1)).alias("c_custkey"),
            F.concat(F.lit("new_"), F.col("c_custkey").cast("string")).alias("c_name"),
            "c_nationkey",
            F.lit(42.0).alias("c_acctbal"),
            "c_mktsegment",
        )
        t.upsert(updates.unionByName(inserts))
        t.delete_where(F.col("c_acctbal") < 100.0)
        rows = (
            t.read()
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_balance"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "c_mktsegment string, n_customers bigint, total_balance double"
    ).orderBy("c_mktsegment")


@register(
    "table_optimize_compaction",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 500.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0
    ),
    merged AS (
        SELECT c_custkey, c_name, c_nationkey,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 7 != 0
        UNION ALL SELECT * FROM upd
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance,
           CAST(1 AS INTEGER) AS files_after_optimize
    FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("versioned-table", "optimize", "compaction"),
)
def table_optimize_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE (bin-packing small-file compaction) under the hash gate:
    snapshot customer into a segment-partitioned VersionedTable, MERGE an
    update set (the rewrite leaves each touched partition holding one file
    per write task), then run ``optimize()`` — a DATA-IDENTICAL new version
    that packs every multi-file partition into ceil(bytes/target)=1 file at
    this scale. The result carries BOTH contracts into the oracle: the
    per-segment aggregate must equal the pure-SQL merge replay (compaction
    changed no data), and ``files_after_optimize`` pins the physical file
    count per partition directory to 1 (compaction actually happened).
    Extension surface — the reference's archives (reference reader.py) are
    append-only with no maintenance path."""
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment",
    )
    root = scratch_dir(prefix="table_optimize_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        t.upsert(
            cust.where(F.col("c_custkey") % 7 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + F.lit(500.0)
            )
        )
        t.optimize()
        man = t._current()
        per_part: dict[str, int] = {}
        for f in man["files"]:
            p = t._file_partition(f)
            per_part[p] = per_part.get(p, 0) + 1
        rows = (
            t.read()
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_balance"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )
        out = [
            (r.c_mktsegment, r.n_customers, r.total_balance, per_part[r.c_mktsegment])
            for r in rows
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        out,
        "c_mktsegment string, n_customers bigint, total_balance double, "
        "files_after_optimize int",
    ).orderBy("c_mktsegment")


@register(
    "table_changes_cdf",
    oracle="""
    WITH ins AS (
        SELECT -(c_custkey + 1) AS c_custkey, 'insert' AS _change_type,
               CAST(42.0 AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey % 97 = 0
    ),
    upd_pre AS (
        SELECT c_custkey, 'update_preimage' AS _change_type,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
    ),
    upd_post AS (
        SELECT c_custkey, 'update_postimage' AS _change_type,
               CAST(c_acctbal + 1000.0 AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
    ),
    dels AS (
        SELECT c_custkey, 'delete' AS _change_type,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey % 10 != 0 AND c_acctbal < 0.0
    )
    SELECT * FROM ins UNION ALL SELECT * FROM upd_pre
    UNION ALL SELECT * FROM upd_post UNION ALL SELECT * FROM dels
    ORDER BY c_custkey, _change_type
    """,
    tags=("versioned-table", "cdc", "change-data-feed"),
)
def table_changes_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed under the hash gate: snapshot customer (v1), MERGE
    an update+insert set (v2), DELETE negative balances (v3), then ask the
    table for ``changes(1, 3)`` — the row-level diff any CDC consumer
    would tail. The feed is computed as one key-equi full-outer join
    between the two time-travelable snapshots with a null-safe struct
    comparison (no stored change log), and the oracle replays the exact
    same edit script in pure SQL: inserts, pre/post update images, and
    deletes with their last-seen values. A wrong pre-image, a missed
    delete, or a phantom change breaks the hash."""
    import shutil

    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment"
    )
    root = scratch_dir(prefix="table_cdf_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        updates = cust.where(F.col("c_custkey") % 10 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
        )
        inserts = cust.where(F.col("c_custkey") % 97 == 0).select(
            (-(F.col("c_custkey") + 1)).alias("c_custkey"),
            F.lit(42.0).alias("c_acctbal"),
            "c_mktsegment",
        )
        t.upsert(updates.unionByName(inserts))
        # updated rows all moved to >= 1000.0, so this deletes only
        # untouched originals — keeps the expected edit script SQL-closed
        t.delete_where(F.col("c_acctbal") < 0.0)
        rows = (
            t.changes(1, 3)
            .select("c_custkey", "_change_type", "c_acctbal")
            .orderBy("c_custkey", "_change_type")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "c_custkey bigint, _change_type string, c_acctbal double"
    ).orderBy("c_custkey", "_change_type")


@register(
    "table_dv_delete",
    oracle="""
    WITH surv AS (  -- two DV waves: takedown of negatives, then key purge
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer
        WHERE NOT (c_acctbal < 0.0) AND c_custkey % 13 != 0
    ),
    merged AS (  -- partition-scoped MERGE over the tombstoned table
        SELECT c_custkey, c_acctbal, c_mktsegment FROM surv
        WHERE NOT (c_mktsegment = 'BUILDING' AND c_custkey % 10 = 0)
        UNION ALL
        SELECT c_custkey, c_acctbal + 1000.0, c_mktsegment FROM surv
        WHERE c_mktsegment = 'BUILDING' AND c_custkey % 10 = 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("versioned-table", "deletion-vector", "merge-on-read"),
)
def table_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes under the hash gate: snapshot customer into a
    segment-partitioned VersionedTable, run TWO deletion-vector waves
    (negative-balance takedown, then a key purge — the second wave merges
    into the first's tombstone set without re-counting already-dead rows),
    then MERGE an update set into ONE partition. The upsert rewrites only
    BUILDING's files (reading through the DV, so a tombstoned row can't
    resurrect into the rewrite), while every other partition carries its
    original files PLUS live tombstones into the final manifest — the read
    must apply them. Physically the two deletes rewrite zero data files
    (asserted here, not just in pytest); the oracle replays the same edit
    script as pure SQL, where tombstones are invisible by construction."""
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment",
    )
    root = scratch_dir(prefix="table_dv_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        files_v1 = t._current()["files"]
        r1 = t.delete_where_dv(F.col("c_acctbal") < 0.0)
        r2 = t.delete_where_dv(F.col("c_custkey") % 13 == 0)
        assert r1["rewritten_files"] == 0 and r2["rewritten_files"] == 0
        assert t._current()["files"] == files_v1  # zero data files touched
        updates = (
            t.read()
            .where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") % 10 == 0))
            .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(1000.0))
        )
        t.upsert(updates)
        rows = (
            t.read()
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_balance"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "c_mktsegment string, n_customers bigint, total_balance double"
    ).orderBy("c_mktsegment")


@register(
    "table_stream_cdc_cdf",
    oracle="""
    WITH b1 AS (  -- batch 1: raise balances for custkey % 50 = 0
        SELECT c_custkey, 'update_postimage' AS _change_type,
               CAST(c_acctbal + 10.0 AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey % 50 = 0
        UNION ALL
        SELECT c_custkey, 'update_preimage', CAST(c_acctbal AS DOUBLE)
        FROM customer WHERE c_custkey % 50 = 0
    ),
    b2 AS (  -- batch 2: brand-new keys
        SELECT c_custkey + 2000000 AS c_custkey, 'insert' AS _change_type,
               CAST(7.0 AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey % 101 = 0
    )
    SELECT * FROM b1 UNION ALL SELECT * FROM b2
    ORDER BY c_custkey, _change_type
    """,
    tags=("versioned-table", "cdc", "streaming", "change-data-feed"),
)
def table_stream_cdc_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full CDC pipeline under one hash gate: a 2-file parquet STREAM
    of updates lands in a VersionedTable via ``start_stream_upsert``
    (foreachBatch MERGE commits, one version per micro-batch), and the
    result is read back as the table's change data feed ``changes(v1,
    v3)`` — exactly what a downstream consumer of a streaming-maintained
    curated dataset would tail. The oracle replays both micro-batches'
    edit script in pure SQL: update pre/post images for batch 1's touched
    keys, inserts for batch 2's new keys. A dropped batch, a re-applied
    checkpointed batch, or a wrong pre-image breaks the hash."""
    import shutil

    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment"
    )
    root = scratch_dir(prefix="table_cdc_cdf_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        batch1 = cust.where(F.col("c_custkey") % 50 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(10.0)
        )
        batch2 = cust.where(F.col("c_custkey") % 101 == 0).select(
            (F.col("c_custkey") + 2000000).alias("c_custkey"),
            F.lit(7.0).alias("c_acctbal"),
            "c_mktsegment",
        )
        src = f"{root}/src"
        batch1.coalesce(1).write.mode("append").parquet(src)
        batch2.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        t.start_stream_upsert(stream, f"{root}/ckpt").awaitTermination(300)
        assert t._current()["version"] == 3, t._current()["version"]
        rows = (
            t.changes(1, 3)
            .select("c_custkey", "_change_type", "c_acctbal")
            .orderBy("c_custkey", "_change_type")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "c_custkey bigint, _change_type string, c_acctbal double"
    ).orderBy("c_custkey", "_change_type")


@register(
    "table_restore_rollback",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(CAST(c_acctbal AS DOUBLE) AS DECIMAL(12,2))) AS DOUBLE)
               AS total_balance
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("versioned-table", "restore", "time-travel"),
)
def table_restore_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE under the hash gate: snapshot customer (v1), apply a
    corrupting MERGE (every balance zeroed — v2), then ``restore(1)`` —
    a new commit that references v1's files without copying data. The
    post-restore aggregate must equal the ORIGINAL table exactly (the
    oracle reads the untouched base table), so a restore that leaked any
    v2 row, lost a file reference, or re-read the corrupted partition
    breaks the hash."""
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment",
    )
    root = scratch_dir(prefix="table_restore_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        t.upsert(cust.withColumn("c_acctbal", F.lit(0.0)))  # the mistake
        t.restore(1)
        rows = (
            t.read()
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_balance"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "c_mktsegment string, n_customers bigint, total_balance double"
    ).orderBy("c_mktsegment")


@register(
    "table_stats_pruned_read",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
           true AS pruned_subset
    FROM orders
    WHERE o_orderkey >= 200 AND o_orderkey <= 699
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    tags=("versioned-table", "stats", "data-skipping", "filter"),
)
def table_stats_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest data skipping under the hash gate: snapshot orders into a
    VersionedTable written range-partitioned on the key (16 files with
    disjoint key ranges), then ``read_where`` a key-range + timestamp
    conjunction. The manifest's footer-harvested per-file min/max stats
    must (a) prune the file list to a strict subset BEFORE Spark plans
    the scan — surfaced as the ``pruned_subset`` column, computed from
    the manifest, so a stats regression flips a value the oracle pins —
    and (b) change nothing about the result: the oracle is the plain
    filter over the base table. Delta/Iceberg-style data skipping as a
    driver-checkable behavior."""
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    root = scratch_dir(prefix="table_skip_")
    preds = [
        ("o_orderkey", ">=", 200),
        ("o_orderkey", "<=", 699),
        ("o_orderdate", ">=", "1996-01-01T00:00:00"),
    ]
    try:
        t = VersionedTable(spark, root, key_cols=["o_orderkey"])
        t.write(orders.repartitionByRange(16, "o_orderkey"))
        man = t._current()
        pruned = t._prune_files(man, preds)
        row = (
            t.read_where(preds)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(dec("o_totalprice", 14, 2)).cast("double").alias("total_price"),
            )
            .collect()[0]
        )
        out = [(row["n_rows"], row["total_price"], len(pruned) < len(man["files"]))]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        out, "n_rows bigint, total_price double, pruned_subset boolean"
    )



@register(
    "table_incremental_rollup",
    oracle="""
    WITH final AS (
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal, c_mktsegment
        FROM customer WHERE c_custkey % 10 != 0 AND c_acctbal >= 0.0
        UNION ALL
        SELECT c_custkey, CAST(c_acctbal + 1000.0 AS DOUBLE), c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT -(c_custkey + 1), CAST(42.0 AS DOUBLE), c_mktsegment
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("versioned-table", "cdc", "materialized-view", "incremental"),
)
def table_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance — the 100 TB answer to a
    fresh aggregate over a mutating table. A per-segment count/balance
    rollup is built once at v1, the base table then takes a MERGE
    (update+insert) and a DELETE, and the view is brought to v3 by
    applying ``changes(1, 3)`` through ``operators.mv`` — cost
    O(|delta| + |view|), no base-table rescan (the returned plan reads
    the CDF join, never re-aggregates the v3 snapshot). The oracle
    recomputes the rollup from scratch over the same edit script, so the
    gate IS the maintained ≡ recomputed contract: a missed pre-image
    decrement, a sign flip, or float drift in the combine all break the
    hash. Decimal arithmetic end-to-end keeps the maintained total
    bit-equal to the recompute under any partitioning."""
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import VersionedTable
    from arrow_parquet_logs_spark.operators.mv import maintain_count_sum_rollup

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment"
    )
    root = scratch_dir(prefix="table_mv_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        view_v1 = (
            t.read(version=1)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_customers"),
                F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_balance"),
            )
        )
        updates = cust.where(F.col("c_custkey") % 10 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
        )
        inserts = cust.where(F.col("c_custkey") % 97 == 0).select(
            (-(F.col("c_custkey") + 1)).alias("c_custkey"),
            F.lit(42.0).alias("c_acctbal"),
            "c_mktsegment",
        )
        t.upsert(updates.unionByName(inserts))
        t.delete_where(F.col("c_acctbal") < 0.0)
        maintained = maintain_count_sum_rollup(
            view_v1,
            t.changes(1, 3).select("c_mktsegment", "c_acctbal", "_change_type"),
            group_cols=["c_mktsegment"],
            count_alias="n_customers",
            sums={"total_balance": "c_acctbal"},
        )
        rows = maintained.orderBy("c_mktsegment").collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "c_mktsegment string, n_customers bigint, total_balance double"
    ).orderBy("c_mktsegment")


@register(
    "table_stream_incremental_rollup",
    oracle="""
    WITH final AS (
        SELECT c_custkey,
               CAST(CASE WHEN c_custkey % 50 = 0 THEN c_acctbal + 10.0
                         ELSE c_acctbal END AS DOUBLE) AS bal,
               c_mktsegment
        FROM customer
        UNION ALL
        SELECT c_custkey + 2000000, CAST(7.0 AS DOUBLE), c_mktsegment
        FROM customer WHERE c_custkey % 101 = 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("versioned-table", "cdc", "streaming", "materialized-view", "incremental"),
)
def table_stream_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance end-to-end: a 2-file parquet
    stream of updates lands in a VersionedTable (foreachBatch MERGE, one
    version per micro-batch), and the ``on_commit`` hook applies EACH
    commit's CDF delta to a per-segment rollup view (operators/mv.py) —
    the view is versioned alongside the table (``view/v{N}``), each step
    costing O(|batch delta| + |view|), never a base-table re-aggregation.
    The returned frame is the LAST maintained view generation; the oracle
    recomputes the rollup from scratch over both micro-batches' edit
    script. A dropped delta, a double-applied batch, or drift in the
    decimal combine breaks the hash — this is the streaming twin of
    ``table_incremental_rollup``'s batch contract."""
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import VersionedTable
    from arrow_parquet_logs_spark.operators.mv import maintain_count_sum_rollup

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment"
    )
    root = scratch_dir(prefix="table_stream_mv_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        view_dir = f"{root}/view"
        t.read(version=1).groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_balance"),
        ).write.parquet(f"{view_dir}/v1")
        state = {"view_version": 1}

        def maintain(version: int) -> None:
            cdf = t.changes(version - 1, version).select(
                "c_mktsegment", "c_acctbal", "_change_type"
            )
            view = spark.read.parquet(f"{view_dir}/v{state['view_version']}")
            maintain_count_sum_rollup(
                view, cdf,
                group_cols=["c_mktsegment"],
                count_alias="n_customers",
                sums={"total_balance": "c_acctbal"},
            ).write.parquet(f"{view_dir}/v{version}")
            state["view_version"] = version

        batch1 = cust.where(F.col("c_custkey") % 50 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(10.0)
        )
        batch2 = cust.where(F.col("c_custkey") % 101 == 0).select(
            (F.col("c_custkey") + 2000000).alias("c_custkey"),
            F.lit(7.0).alias("c_acctbal"),
            "c_mktsegment",
        )
        src = f"{root}/src"
        batch1.coalesce(1).write.mode("append").parquet(src)
        batch2.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        t.start_stream_upsert(stream, f"{root}/ckpt", on_commit=maintain).awaitTermination(300)
        assert state["view_version"] == 3, state["view_version"]
        rows = (
            spark.read.parquet(f"{view_dir}/v3").orderBy("c_mktsegment").collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "c_mktsegment string, n_customers bigint, total_balance double"
    ).orderBy("c_mktsegment")


@register(
    "table_shallow_clone",
    oracle="""
    WITH clone_rows AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000.0
                    ELSE c_acctbal END AS bal
        FROM customer WHERE c_custkey % 13 != 0
    ),
    source_rows AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 500.0
                    ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT side, n_rows, total_balance FROM (
        SELECT 'clone' AS side, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
        FROM clone_rows
        UNION ALL
        SELECT 'source', CAST(count(*) AS BIGINT),
               CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE)
        FROM source_rows
    ) ORDER BY side
    """,
    tags=("versioned-table", "clone", "deletion-vector"),
)
def table_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy SHALLOW CLONE under the hash gate
    (logstore/table.py:clone_to): snapshot customer into a
    segment-partitioned VersionedTable, clone it (metadata only — the
    clone's manifest references the source files by absolute path), then
    diverge BOTH sides: the clone takes an upsert (+1000 on every 10th
    key) and a deletion-vector delete (every 13th key, remapped
    tombstones); the source takes its own upsert (+500 on every 7th key)
    AFTER the clone. The aggregate over each side proves four things at
    once — the clone read plan resolves absolute file references, the
    remapped DV keys match them, clone copy-on-write never leaks into the
    source, and the clone is pinned to its snapshot (the source's later
    upsert is invisible to it)."""
    import os
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import VersionedTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment",
    )
    root = scratch_dir(prefix="shallow_clone_")
    try:
        t = VersionedTable(
            spark, os.path.join(root, "src"), key_cols=["c_custkey"],
            partition_col="c_mktsegment",
        )
        t.write(cust)
        clone = t.clone_to(os.path.join(root, "clone"))
        clone.upsert(
            cust.where(F.col("c_custkey") % 10 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
            )
        )
        clone.delete_where_dv("c_custkey % 13 = 0")
        # source keeps evolving AFTER the clone; the clone must not see it
        t.upsert(
            cust.where(F.col("c_custkey") % 7 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + F.lit(500.0)
            )
        )

        def side(tab, name):
            return tab.read().agg(
                F.lit(name).alias("side"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_balance"),
            ).select("side", "n_rows", "total_balance")

        rows = side(clone, "clone").unionByName(side(t, "source")).collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "side string, n_rows bigint, total_balance double"
    ).orderBy("side")


@register(
    "table_check_constraints",
    oracle="""
    WITH merged AS (
        SELECT c_custkey, c_mktsegment,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 250.0
                    ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("versioned-table", "constraints", "data-quality"),
)
def table_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraint enforcement through the commit protocol
    (logstore/table.py:add_constraint): snapshot customer, add a balance
    floor the data satisfies (add_constraint validates EXISTING rows
    first — a one-pass certification), then attempt an upsert that
    violates it — the merge must be refused with NOTHING staged or
    committed — then apply a valid upsert and aggregate. The oracle is
    the base data plus only the VALID upsert: if the violating merge
    leaked any rows, versions, or partial files into the table, the hash
    breaks. This is the write-path data-quality gate a 100 TB CDC
    pipeline needs: malformed batches bounce atomically at one
    aggregation pass of cost, not after a cleanup job."""
    import shutil

    from arrow_parquet_logs_spark.functions.numeric import dec
    from arrow_parquet_logs_spark.logstore.table import (
        ConstraintViolation,
        VersionedTable,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"), "c_mktsegment",
    )
    root = scratch_dir(prefix="check_cons_")
    try:
        t = VersionedTable(
            spark, root, key_cols=["c_custkey"], partition_col="c_mktsegment"
        )
        t.write(cust)
        t.add_constraint("bal_floor", "c_acctbal >= -1000.0")
        try:
            t.upsert(
                cust.where(F.col("c_custkey") % 10 == 0).withColumn(
                    "c_acctbal", F.lit(-99999.0)
                )
            )
            raise AssertionError("violating upsert was not refused")
        except ConstraintViolation:
            pass
        t.upsert(
            cust.where(F.col("c_custkey") % 10 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + F.lit(250.0)
            )
        )
        rows = (
            t.read()
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_balance"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "c_mktsegment string, n_rows bigint, total_balance double"
    ).orderBy("c_mktsegment")


@register(
    "table_incremental_join",
    oracle="""
    WITH a_final AS (
        SELECT o_custkey AS custkey, CAST(o_totalprice AS DOUBLE) AS price
        FROM orders WHERE CAST(o_totalprice AS DOUBLE) >= 1000.0
        UNION ALL
        SELECT o_custkey, 9123.45 FROM orders WHERE o_orderkey % 101 = 0
    ),
    b_final AS (
        SELECT c_custkey AS custkey,
               CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS segment
        FROM customer
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM a_final JOIN b_final USING (custkey)
    GROUP BY segment ORDER BY segment
    """,
    tags=("versioned-table", "cdc", "materialized-view", "incremental", "join"),
)
def table_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized JOIN — the join tier of
    IVM (operators/mv.py:maintain_equijoin_view), completing the
    aggregate tier `table_incremental_rollup` pins. An orders⋈customer
    view is materialized at v1; BOTH base tables then mutate (orders:
    insert + delete through separate commits; customer: a segment-moving
    update — the value-change case that invalidates every joined order of
    the moved customers), and the view is brought current by
    affected-key recompute over the two change feeds: one anti-join on
    the stored view plus a join of the affected-key SLICES — never a full
    rejoin. The oracle recomputes the final join from scratch, so the
    gate is maintained ≡ recomputed across inserts, deletes, duplicate
    join keys (customers with many orders), and both-sides churn."""
    import shutil

    from arrow_parquet_logs_spark.logstore.table import VersionedTable
    from arrow_parquet_logs_spark.operators.mv import maintain_equijoin_view

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )
    root = scratch_dir(prefix="join_mv_")
    try:
        ta = VersionedTable(spark, root + "/a", key_cols=["o_orderkey"])
        tb = VersionedTable(spark, root + "/b", key_cols=["custkey"])
        ta.write(orders)
        tb.write(cust)
        view0 = ta.read(version=1).join(tb.read(version=1), "custkey")
        ta.upsert(
            orders.where(F.col("o_orderkey") % 101 == 0).select(
                # sign-flip key: scale-proof insert ids (orderkeys are
                # positive at every SF, so -k never collides with an
                # existing order — the +10M offset did at sf10)
                (-(F.col("o_orderkey") + 1)).alias("o_orderkey"),
                "custkey", F.lit(9123.45).alias("price"),
            )
        )
        ta.delete_where(F.col("price") < 1000.0)
        tb.upsert(
            cust.where(F.col("custkey") % 7 == 0).withColumn("segment", F.lit("MOVED"))
        )
        maintained = maintain_equijoin_view(
            view0,
            ta.read(), tb.read(), ["custkey"],
            ta.changes(1, 3).select("custkey"),
            tb.changes(1, 2).select("custkey"),
        )
        rows = (
            maintained.groupBy("segment")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("price").cast("decimal(14,2)")).cast("double")
                .alias("total_price"),
            )
            .orderBy("segment")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "segment string, n_rows bigint, total_price double"
    ).orderBy("segment")


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
           strftime(min(o_orderdate), '%Y-%m-%dT%H:%M:%S') AS first_order,
           strftime(max(o_orderdate), '%Y-%m-%dT%H:%M:%S') AS last_order
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("source", "orc", "reference-parity"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC joins the source matrix (parquet / Arrow IPC / CSV / JSON(L) /
    XML): write ``orders`` out as snappy ORC partitioned by status, read it
    back with a pushed-down priority filter, aggregate — the oracle runs
    on the ORIGINAL parquet, so a green hash proves full type fidelity
    (int64 / double / string / microsecond timestamps under the pinned UTC
    session) through the ORC writer+reader and directory-partition
    discovery. ORC ships in Spark's classpath (orc-core); at 100 TB it is
    the interchange format Hive-era estates hand us, read with the same
    vectorized scan + predicate pushdown + partition pruning as parquet
    (tests/test_sources_and_relational.py pins the pushdown in the plan)."""
    import shutil

    root = scratch_dir(prefix="orc_roundtrip_")
    try:
        load_table(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).orc(root)
        back = (
            spark.read.orc(root)
            .where(F.col("o_orderpriority") == "1-URGENT")
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
                .cast("double").alias("sum_price"),
                F.date_format(F.min("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss")
                .alias("first_order"),
                F.date_format(F.max("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss")
                .alias("last_order"),
            )
            .orderBy("o_orderstatus")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        back,
        "o_orderstatus string, n_orders bigint, sum_price double, "
        "first_order string, last_order string",
    ).orderBy("o_orderstatus")


@register(
    "source_avro_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           strftime(min(ts), '%Y-%m-%dT%H:%M:%S') AS first_ts,
           strftime(max(ts), '%Y-%m-%dT%H:%M:%S') AS last_ts
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("source", "avro", "reference-parity"),
)
def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro joins the source matrix WITHOUT spark-avro (absent from the
    sandbox classpath): sources/avro.py implements the public Object
    Container File spec — zigzag varints, deflate blocks, sync markers —
    as a distributed mapInPandas sink (one container per partition) and a
    binaryFile + mapInPandas scan. This query writes a week of ``events``
    out as deflate Avro, reads it back, aggregates; the oracle runs on the
    ORIGINAL parquet, so a green hash certifies the whole encode→decode
    chain (longs, doubles, strings, null unions, timestamp-micros under
    the pinned UTC session)."""
    import shutil

    from arrow_parquet_logs_spark.sources.avro import read_avro, write_avro

    root = scratch_dir(prefix="avro_roundtrip_")
    try:
        week = (
            load_table(spark, sf_dir, "events")
            .where((F.col("ts") >= F.lit(_T0)) & (F.col("ts") < F.lit(_T1)))
            .select("event_id", "ts", "user_id", "event_type", "value")
            .repartition(8)
        )
        wrote = write_avro(week, root).agg(F.sum("n_rows")).collect()[0][0]
        back = read_avro(
            spark, root,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        rows = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                .alias("sum_value"),
                F.date_format(F.min("ts"), "yyyy-MM-dd'T'HH:mm:ss").alias("first_ts"),
                F.date_format(F.max("ts"), "yyyy-MM-dd'T'HH:mm:ss").alias("last_ts"),
            )
            .orderBy("event_type")
            .collect()
        )
        n_back = sum(r["n_events"] for r in rows)
        if wrote != n_back:
            raise ValueError(f"avro roundtrip row loss: wrote {wrote}, read {n_back}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, n_events bigint, sum_value double, "
        "first_ts string, last_ts string",
    ).orderBy("event_type")
