"""Scalar-function surface (SURVEY.md §2.8 X1-X6) + remaining aggregate
shapes: exact/approx distinct, HAVING, correlated-aggregate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.functions.numeric import dec, qfloor
from arrow_parquet_logs_spark.queries.catalog import register
from arrow_parquet_logs_spark.sources.tables import load_table


@register(
    "logs_iso_format",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts_iso
    FROM events WHERE event_id < 100 ORDER BY event_id
    """,
    tags=("scalar", "reference-parity"),
)
def logs_iso_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: timestamp → ISO-8601 string at the output boundary (reference
    reader.py:140-141 does per-row .isoformat(); here it's one codegen'd
    date_format over the column)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_id") < 100)
        .select("event_id", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts_iso"))
        .orderBy("event_id")
    )


@register(
    "rows_to_json",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type, user_id := user_id))::VARCHAR AS js
    FROM events WHERE event_id < 100 ORDER BY event_id
    """,
    tags=("scalar", "json", "reference-parity"),
)
def rows_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: row → JSON at the delivery boundary (reference reader.py:546 does
    json.dumps per row in Python; to_json keeps it JVM-side and the JSON
    text is byte-identical across engines)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_id") < 100)
        .select(
            "event_id",
            F.to_json(F.struct(F.col("event_id"), F.col("event_type"), F.col("user_id"))).alias("js"),
        )
        .orderBy("event_id")
    )


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_type, 1, 6) AS type_prefix,
           CAST(length(p_name) AS INTEGER) AS name_len,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num,
           concat(p_brand, '/', p_type) AS brand_type
    FROM part ORDER BY p_partkey
    """,
    tags=("scalar",),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function pass-through (upper/substr/length/regexp_extract/
    concat) — all whole-stage codegen, no UDFs (SURVEY.md §2.10 thesis)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1).cast("int").alias("brand_num"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    ).orderBy("p_partkey")


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT DISTINCT (expand + two-phase agg in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sample_lineitem",
    oracle=None,  # sampling is engine-specific by construction; rows-only
    tags=("sample",),
)
def sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE-style Bernoulli sampling with a fixed seed — reproducible
    within Spark (same seed + same partitioning), but sampling sequences are
    engine-specific so there is no cross-engine oracle. At 100 TB this is
    the first stage of any profiling/eyeball query."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.01, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # HLL sketches are engine-specific; driver runs rows-only
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB cardinality path —
    one pass, fixed memory, mergeable across partitions. No SQL oracle: the
    sketch estimate is engine-specific by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < 0.2 * avg_qty
    """,
    tags=("agg", "join", "correlated"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate decorrelated into a per-key agg
    + equi-join — the plan Catalyst produces for the subquery form, written
    explicitly. Both sides shuffle once on l_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(dec("l_quantity", 12, 2)).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice", 14, 2)).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure, l_extendedprice AS val
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber, measure
    """,
    tags=("unpivot",),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt) via ``stack`` — the inverse of pivot, no
    shuffle at all (row-local expansion)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(2, 'quantity', l_quantity, 'extendedprice', l_extendedprice) AS (measure, val)",
    ).orderBy("l_orderkey", "l_linenumber", "measure")


@register(
    "agg_having_large_orders",
    oracle="""
    SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    ORDER BY l_orderkey
    """,
    tags=("agg", "having"),
)
def agg_having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (TPC-H Q18 core): filter on the aggregate, pushed
    after partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    total = F.sum(dec("l_quantity", 12, 2))
    return (
        li.groupBy("l_orderkey")
        .agg(total.cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 150)
        .orderBy("l_orderkey")
    )


@register(
    "lineitem_price_quantity_corr",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_items,
           floor(((sxy - sx * sy / n) / (n - 1)) * 1000000) / 1000000 AS covar_qty_price,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
    FROM s ORDER BY l_returnflag
    """,
    tags=("stats", "agg"),
)
def lineitem_price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance from DECIMAL-exact raw sums
    (Σx, Σy, Σxy, Σx², Σy² aggregate as fixed-point, so any partitioning or
    engine produces identical bits), then the moment identities evaluate in
    one fixed double-op order. Spark's built-in corr/covar_samp stream
    doubles in partition order and could never hash-match another engine;
    this form is the same single-pass one-shuffle plan."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity", 12, 2), dec("l_extendedprice", 12, 2)
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return agg.select(
        "l_returnflag",
        n.cast("bigint").alias("n_items"),
        qfloor((sxy - sx * sy / n) / (n - F.lit(1))).alias("covar_qty_price"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "events_value_percentiles_approx",
    oracle=None,  # t-digest style sketch estimates are engine-specific
    tags=("agg", "approx", "percentile"),
)
def events_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: the 100 TB quantile path — one pass, bounded
    memory, partition-mergeable, unlike the exact `percentile` used by the
    oracle-checked twin (events_value_percentiles). accuracy=10000 keeps the
    estimate within 1/10000 rank error. Rows-only: the sketch is
    engine-specific by construction; the exact twin carries the hash gate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
            F.percentile_approx("value", 0.9, 10000).alias("p90"),
            F.percentile_approx("value", 0.99, 10000).alias("p99"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "docs_top_terms_approx",
    oracle=None,  # count-sketch heavy-hitters are engine-specific
    tags=("text", "approx", "topk"),
)
def docs_top_terms_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy hitters over the token stream: the sketch
    (bounded memory, mergeable) replaces the full token→count shuffle that
    the exact top-k (docs_token_freq) pays — at 100 TB the only way to rank
    a vocabulary that doesn't fit anywhere. Rows-only like the other
    sketches; the exact twin is hash-checked."""
    from arrow_parquet_logs_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    return toks.select(
        F.explode(F.expr("approx_top_k(tok, 10)")).alias("e")
    ).select(F.col("e.item").alias("token"), F.col("e.count").alias("n"))


@register(
    "scalar_function_breadth",
    oracle="""
    SELECT n_nationkey,
           upper(n_name) AS name_upper,
           lower(n_name) AS name_lower,
           lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS key_padded,
           substr(n_name, 1, 3) AS name_prefix,
           length(n_name) AS name_len,
           reverse(n_name) AS name_rev,
           replace(n_name, 'A', '_') AS name_sub,
           CAST(abs(n_nationkey - 12) AS BIGINT) AS key_dist,
           CAST(n_nationkey % 5 AS BIGINT) AS key_mod,
           CAST(sign(n_nationkey - 12) AS DOUBLE) AS key_sign,
           round(power(n_nationkey, 2) / 100, 6) AS key_sq,
           COALESCE(NULLIF(n_name, 'FRANCE'), 'REDACTED') AS name_masked,
           CASE WHEN n_regionkey IS NULL THEN -1 ELSE n_regionkey END AS region_nvl,
           greatest(n_nationkey, n_regionkey * 5) AS g,
           least(n_nationkey, n_regionkey * 5) AS l
    FROM nation ORDER BY n_nationkey
    """,
    tags=("scalar", "functions"),
)
def scalar_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One projection exercising the string / math / null-handling scalar
    family (SURVEY.md §2.8's X-functions beyond the reference's four):
    upper/lower/lpad/substr/length/reverse/replace, abs/mod/sign/power,
    coalesce/nullif and greatest/least — all whole-stage-codegen row
    expressions, zero shuffles, zero UDFs."""
    na = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return na.select(
        "n_nationkey",
        F.upper("n_name").alias("name_upper"),
        F.lower("n_name").alias("name_lower"),
        F.lpad(k.cast("string"), 4, "0").alias("key_padded"),
        F.substring("n_name", 1, 3).alias("name_prefix"),
        F.length("n_name").alias("name_len"),
        F.reverse("n_name").alias("name_rev"),
        F.regexp_replace("n_name", "A", "_").alias("name_sub"),
        F.abs(k - 12).cast("bigint").alias("key_dist"),
        (k % 5).cast("bigint").alias("key_mod"),
        F.signum(k - 12).cast("double").alias("key_sign"),
        F.round(F.pow(k, 2) / 100, 6).alias("key_sq"),
        F.coalesce(F.nullif("n_name", F.lit("FRANCE")), F.lit("REDACTED")).alias("name_masked"),
        F.when(F.col("n_regionkey").isNull(), F.lit(-1))
        .otherwise(F.col("n_regionkey"))
        .alias("region_nvl"),
        F.greatest(k, F.col("n_regionkey") * 5).alias("g"),
        F.least(k, F.col("n_regionkey") * 5).alias("l"),
    ).orderBy("n_nationkey")


@register(
    "orders_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
           CAST(CAST(o_orderdate - INTERVAL 7 DAY AS DATE) AS VARCHAR) AS week_before,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS quarter_out,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_95,
           CAST(CAST(last_day(o_orderdate) AS DATE) AS VARCHAR) AS month_end,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
    tags=("scalar", "date"),
)
def orders_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic family: fixed-interval shifts, month-precise
    add (add_months handles end-of-month clamping identically in both
    engines), day deltas against an epoch, and month boundary snapping —
    all codegen date math on the pushed-down key filter."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.where(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.date_format(d, "yyyy-MM-dd").alias("o_orderdate"),
            F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
            F.date_format(F.date_sub(d, 7), "yyyy-MM-dd").alias("week_before"),
            F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("quarter_out"),
            F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_95"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        )
        .orderBy("o_orderkey")
    )
