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
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE CAST(concat('0x', substr(md5(
            concat('samp:', CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))
          ), 1, 15)) AS BIGINT) % 10000 < 100
    """,
    tags=("sample",),
)
def sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1% content-stable hash sample: a row is in the sample iff the
    portable md5-derived hash of its primary key lands in the first 100 of
    10,000 buckets. Strictly better than seeded Bernoulli at scale — the
    sample is a pure function of row identity, so it is partition-,
    re-ingestion- and engine-invariant (Bernoulli's RNG stream is none of
    those, which is why the former form could only be rows-only checked).
    Same mechanism as docs_split_assignment's hash buckets."""
    from arrow_parquet_logs_spark.functions.hashing import hash64

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.lit("samp:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string"),
    )
    return li.where(hash64(key) % 10000 < 100).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           true AS parts_in_bounds,
           true AS orders_in_bounds
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB cardinality path —
    one pass, fixed memory, mergeable across partitions. The sketch bits
    are engine-specific, so the estimate itself can't be hash-compared —
    instead the query emits the exact cardinalities (hash-checked) plus
    booleans asserting the HLL estimate lies within 3·rsd of exact
    (rsd = 0.05 default → ±15%). A sketch regression flips a boolean and
    fails the driver's hash gate — the bounds check IS driver-visible."""
    li = load_table(spark, sf_dir, "lineitem")
    bound = 3 * 0.05
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_partkey").alias("_ap"),
            F.approx_count_distinct("l_orderkey").alias("_ao"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_orders",
            (F.abs(F.col("_ap") - F.col("exact_parts"))
             <= F.lit(bound) * F.col("exact_parts")).alias("parts_in_bounds"),
            (F.abs(F.col("_ao") - F.col("exact_orders"))
             <= F.lit(bound) * F.col("exact_orders")).alias("orders_in_bounds"),
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
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           true AS p50_in_bounds, true AS p90_in_bounds, true AS p99_in_bounds
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "approx", "percentile"),
)
def events_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: the 100 TB quantile path — one pass, bounded
    memory, partition-mergeable, unlike the exact `percentile` of the
    hash-checked twin (events_value_percentiles). accuracy=10000 bounds the
    rank error at n/10000. The sketch value is engine-specific, so the
    query emits the exact group counts plus booleans asserting each
    estimate lies between the exact quantiles at q ± 0.001 (10× the
    guaranteed rank error) — a sketch regression flips a boolean and fails
    the driver's hash gate."""
    ev = load_table(spark, sf_dir, "events")
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    # pass 1: the sketch values (one row per group — broadcastable)
    ap = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[F.percentile_approx("value", q, 10000).alias(f"_ap_{k}") for k, q in qs.items()],
    )
    # pass 2: RANK-based validity — the returned value's rank interval
    # [#(<ap)+1, #(<=ap)] must intersect [q·n − m, q·n + m] with
    # m = n·0.001 + 1 (10× the accuracy guarantee, +1 for discreteness).
    # Rank checks are interpolation-free: Spark's exact `percentile`
    # interpolates between data values, so a value-based bound is narrower
    # than data spacing on small groups and flags correct sketches.
    j = ev.join(F.broadcast(ap), "event_type")
    aggs = [F.first("n_events").alias("n_events")]
    flags = []
    for k, q in qs.items():
        aggs += [
            F.sum((F.col("value") < F.col(f"_ap_{k}")).cast("long")).alias(f"_lt_{k}"),
            F.sum((F.col("value") <= F.col(f"_ap_{k}")).cast("long")).alias(f"_le_{k}"),
        ]
        m = F.col("n_events") * 0.001 + 1
        flags.append(
            (
                (F.col(f"_lt_{k}") + 1 <= q * F.col("n_events") + m)
                & (F.col(f"_le_{k}") >= q * F.col("n_events") - m)
            ).alias(f"{k}_in_bounds")
        )
    return (
        j.groupBy("event_type")
        .agg(*aggs)
        .select("event_type", "n_events", *flags)
        .orderBy("event_type")
    )


@register(
    "docs_top_terms_approx",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ),
    c AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
    SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS vocab_size,
           true AS topk_valid
    """,
    tags=("text", "approx", "topk"),
)
def docs_top_terms_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy hitters over the token stream: the sketch
    (bounded memory, mergeable) replaces the full token→count shuffle that
    the exact top-k (docs_token_freq) pays — at 100 TB the only way to rank
    a vocabulary that doesn't fit anywhere.

    Sketch items are engine-specific, so the driver-visible check is
    set-validity against the exact counts, tie-agnostic: with kth = the
    10th-highest exact count, the sketch's 10 items must (a) all have exact
    count ≥ kth and (b) include every token whose count strictly exceeds
    kth — i.e. be SOME valid resolution of the exact top-10 under ties.
    The emitted row carries the exact vocabulary size (hash-checked) plus
    that validity boolean; a sketch regression flips it and fails the
    driver's hash gate."""
    from arrow_parquet_logs_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).persist()
    kth = exact.orderBy(F.desc("n"), "token").limit(10).agg(F.min("n").alias("kth"))
    sketch = toks.select(F.explode(F.expr("approx_top_k(token, 10)")).alias("e")).select(
        F.col("e.item").alias("token")
    )
    # (a) nothing below the kth count sneaks in
    f1 = (
        sketch.join(exact, "token", "left")
        .crossJoin(F.broadcast(kth))
        .agg(F.min(F.coalesce(F.col("n") >= F.col("kth"), F.lit(False))).alias("f1"))
    )
    # (b) every strictly-above-kth token is present
    must = exact.crossJoin(F.broadcast(kth)).where(F.col("n") > F.col("kth"))
    f2 = (
        must.join(sketch.withColumn("_in", F.lit(1)), "token", "left")
        .agg(F.coalesce(F.min(F.col("_in").isNotNull()), F.lit(True)).alias("f2"))
    )
    vocab = exact.agg(F.count(F.lit(1)).alias("vocab_size"))
    return (
        vocab.crossJoin(F.broadcast(f1))
        .crossJoin(F.broadcast(f2))
        .select("vocab_size", (F.col("f1") & F.col("f2")).alias("topk_valid"))
    )


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


@register(
    "agg_hll_sketch_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS union_in_bounds,
           true AS daily_ge_merged
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "approx", "sketch", "rollup"),
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the pattern that makes 100 TB cardinality
    dashboards possible: per-(day, event_type) HLL sketches are
    PRE-AGGREGATED once (`hll_sketch_agg`, a few KB each, storable in a
    rollup table), then any coarser cut re-aggregates by UNIONING sketches
    (`hll_union_agg`) instead of rescanning raw events. The sketch bytes
    are engine-specific, so (the agg_approx_distinct recipe) the query
    emits the exact per-type cardinalities (hash-checked) plus booleans
    pinning that (a) the union-of-dailies estimate lands within HLL error
    bounds of exact and (b) summed daily distincts ≥ the merged distinct —
    the set-union inequality any correct merge must satisfy."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("daily_users"),
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("daily_users").alias("sum_daily"),
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users"))
    bound = 3 * 0.02625  # default lgConfigK=12 → rsd ≈ 1.04/√4096
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            (F.abs(F.col("est") - F.col("exact_users"))
             <= F.lit(bound) * F.col("exact_users")).alias("union_in_bounds"),
            (F.col("sum_daily") >= F.col("exact_users")).alias("daily_ge_merged"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_map_functions",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS qty,
               CAST(l_extendedprice AS DOUBLE) AS price,
               CAST(l_discount * 100 AS DOUBLE) AS disc
        FROM lineitem WHERE l_orderkey < 1000
    ),
    counted AS (
        SELECT *,
               CAST((CASE WHEN disc > 5 THEN 1 ELSE 0 END)
                  + (CASE WHEN price > 5 THEN 1 ELSE 0 END)
                  + (CASE WHEN qty > 5 THEN 1 ELSE 0 END) AS INT) AS n_keys
        FROM base
    ),
    uni AS (
        SELECT l_orderkey, l_linenumber, n_keys, 'disc' AS key, disc * 2 AS value
        FROM counted WHERE disc > 5
        UNION ALL
        SELECT l_orderkey, l_linenumber, n_keys, 'price', price * 2
        FROM counted WHERE price > 5
        UNION ALL
        SELECT l_orderkey, l_linenumber, n_keys, 'qty', qty * 2
        FROM counted WHERE qty > 5
    )
    SELECT l_orderkey, l_linenumber, n_keys, key, value
    FROM uni ORDER BY l_orderkey, l_linenumber, key
    """,
    tags=("scalar", "map", "higher-order"),
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAP-typed column function family under the hash gate:
    create_map → map_filter (drop small values) → transform_values
    (double) → map_entries + array_sort → explode back to rows. Map
    iteration order is engine-defined, so the result is presented as
    key-sorted exploded rows and the oracle rebuilds them relationally —
    a lambda mis-binding (filtering by key instead of value, transforming
    the wrong side) changes rows and breaks the hash. All higher-order
    functions stay JVM-side (no Python in the loop)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity").cast("double"),
        F.lit("price"), F.col("l_extendedprice").cast("double"),
        F.lit("disc"), (F.col("l_discount") * 100).cast("double"),
    )
    kept = F.map_filter(m, lambda k, v: v > 5)
    doubled = F.transform_values(kept, lambda k, v: v * 2)
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.size(doubled).cast("int").alias("n_keys"),
            F.explode(F.array_sort(F.map_entries(doubled))).alias("e"),
        )
        .select(
            "l_orderkey", "l_linenumber", "n_keys",
            F.col("e.key").alias("key"), F.col("e.value").alias("value"),
        )
        .orderBy("l_orderkey", "l_linenumber", "key")
    )


@register(
    "agg_bitwise_functions",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_orderkey) AS BIGINT) AS and_key,
           CAST(bit_or(l_orderkey) AS BIGINT) AS or_key,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS xor_key,
           CAST(bit_count(bit_or(l_orderkey)) AS INT) AS or_popcount
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and / bit_or / bit_xor + bit_count):
    order- and partitioning-independent by algebra (associative,
    commutative), so the hash gate needs no rounding discipline at all."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_orderkey").alias("and_key"),
            F.bit_or("l_orderkey").alias("or_key"),
            F.bit_xor("l_orderkey").alias("xor_key"),
            F.bit_count(F.bit_or("l_orderkey")).cast("int").alias("or_popcount"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "lineitem_ols_regression",
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
           floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000) / 1000000
               AS slope,
           floor(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)
                 * 1000000) / 1000000 AS intercept,
           floor((((n * sxy - sx * sy) * (n * sxy - sx * sy))
                  / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1000000) / 1000000
               AS r2
    FROM s ORDER BY l_returnflag
    """,
    tags=("stats", "agg", "regression"),
)
def lineitem_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS (price regressed on quantity, per return flag):
    slope, intercept, and R² from the SAME decimal-exact raw-moment sums
    as `lineitem_price_quantity_corr` — a linear model fit is one
    aggregation pass at any scale when expressed through Σx/Σy/Σxy/Σx²/Σy²
    (the moments are partition-mergeable, which is the whole trick; no
    gradient loop, no collect). Every double op evaluates in one pinned
    order on order-independent inputs, so both engines produce identical
    bits before the qfloor quantization."""
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
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return agg.select(
        "l_returnflag",
        n.cast("bigint").alias("n_items"),
        qfloor(slope).alias("slope"),
        qfloor((sy - slope * sx) / n).alias("intercept"),
        qfloor(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    ).orderBy("l_returnflag")


_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]
# round(1e6*log10(1+1/d)) for d=1..9 — sums to exactly 1,000,000, so the
# expected counts partition n exactly in ppm arithmetic.


@register(
    "lineitem_benford_screen",
    oracle=f"""
    WITH fd AS MATERIALIZED (
      SELECT CAST(regexp_extract(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR),
                                 '[1-9]') AS INTEGER) AS digit
      FROM lineitem
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM fd GROUP BY digit),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fd),
    grid AS (
      SELECT CAST(t.d AS INTEGER) AS digit,
             ([{", ".join(str(x) for x in _BENFORD_PPM)}])[CAST(t.d AS INTEGER)] AS ppm
      FROM (SELECT unnest(range(1, 10)) AS d) t
    )
    SELECT g.digit,
           COALESCE(o.n_obs, 0) AS n_obs,
           floor((CAST((SELECT n FROM n) AS DOUBLE) * g.ppm / 1000000.0) * 1000000)
               / 1000000 AS expected,
           CAST(CAST((COALESCE(o.n_obs, 0) * 1000000 - (SELECT n FROM n) * g.ppm)
                     AS HUGEINT)
                * CAST((COALESCE(o.n_obs, 0) * 1000000 - (SELECT n FROM n) * g.ppm)
                       AS HUGEINT)
                // (CAST((SELECT n FROM n) AS HUGEINT) * g.ppm) AS DOUBLE)
           / 1000000.0 AS chi2_contrib
    FROM grid g LEFT JOIN obs o ON o.digit = g.digit
    ORDER BY g.digit
    """,
    tags=("stats", "benford", "data-quality", "screen"),
)
def lineitem_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over extended prices — the fraud/
    synthetic-data smell test: natural multiplicative quantities put
    ~30.1% of first significant digits at 1, and a flat or spiky digit
    histogram (this synthetic corpus fails loudly, which is the point of
    a screen) shows up as fat chi-square contributions. Expected shares
    are ppm INTEGER LITERALS (they sum to exactly 10⁶), the first digit
    comes from the DECIMAL(12,2) string rendering (exact and identical
    in both engines — never from float log10, whose boundary cells
    misclassify powers of ten), and each contribution is the integer
    rational (obs·10⁶ − n·ppm)² DIV (n·ppm) in DECIMAL(38,0). Missing
    digits enter from the 1..9 grid with obs=0 rather than vanishing.
    One scan, then digit-sized math — the screen-suite cost shape."""
    ev = load_table(spark, sf_dir, "lineitem")
    fd = ev.select(
        F.regexp_extract(
            F.col("l_extendedprice").cast("decimal(12,2)").cast("string"), "[1-9]", 0
        ).cast("int").alias("digit")
    )
    obs = fd.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    n = fd.agg(F.count(F.lit(1)).cast("long").alias("n"))
    grid = spark.range(1, 10).select(
        F.col("id").cast("int").alias("digit"),
        F.element_at(F.array(*[F.lit(x) for x in _BENFORD_PPM]), F.col("id").cast("int"))
        .cast("long").alias("ppm"),
    )
    full = (
        grid.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            "ppm", "n",
        )
    )
    expected = qfloor(F.col("n").cast("double") * F.col("ppm") / F.lit(1000000.0))
    term = F.expr(
        "CAST(CAST(n_obs * 1000000 - n * ppm AS DECIMAL(18,0))"
        "     * CAST(n_obs * 1000000 - n * ppm AS DECIMAL(18,0)) AS DECIMAL(38,0))"
        " DIV CAST(n * ppm AS DECIMAL(18,0))"
    )
    return full.select(
        "digit", "n_obs",
        expected.alias("expected"),
        (term.cast("double") / F.lit(1000000.0)).alias("chi2_contrib"),
    ).orderBy("digit")
