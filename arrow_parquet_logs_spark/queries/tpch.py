"""Relational extension surface over the TPC-H-ish star schema.

The reference has no joins / group-by / windows / set ops (SURVEY.md §2.3-
§2.7 — all "None"); this module supplies that surface the Spark way. Each
query is also a physical-plan statement of intent for 100 TB:

- dimension tables (region/nation/customer/supplier/part) are broadcast —
  no shuffle of the fact table for those joins;
- fact-fact joins (orders ⋈ lineitem) are equi-joins on the natural key so
  Catalyst uses sort-merge with AQE skew handling;
- top-k is ORDER BY + LIMIT → TakeOrderedAndProject (no global sort);
- money aggregates go through DECIMAL (functions.numeric) so results are
  bit-identical across engines and partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from arrow_parquet_logs_spark.functions.numeric import dec, dsum, davg
from arrow_parquet_logs_spark.queries.catalog import register
from arrow_parquet_logs_spark.sources.tables import load_table, load_tables

# shared SQL fragments (keep Spark expression and oracle literally in sync).
#
# PURE DECIMAL arithmetic end to end — found at the 10x scale probe
# (SCALING.md): the old form computed the per-row product in DOUBLE and
# cast the result to DECIMAL, and the double→decimal rounding of a
# 3-factor product is not bit-identical across engines (Spark rounds the
# shortest decimal repr, DuckDB the binary value) — invisible at 60k rows,
# 4 micro-units of sum_charge drift across 6M. Casting the INPUTS to
# decimal first is exact everywhere: p/d/t are 2-decimal quantities, so
# every product below is an exact decimal (≤6 fractional digits) with no
# rounding step anywhere, at any row count. Widths stay ≤38 in both
# engines (the inner product is down-cast to (18,6), exact: ≤6 true
# fractional digits, magnitude < 1e12).
_DISC_PRICE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(18,6))"
)
_CHARGE_SQL = (
    "CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(18,6)) * "
    "(1 + CAST(l_tax AS DECIMAL(8,4))) AS DECIMAL(20,6))"
)


def _disc_price():
    return (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
    ).cast("decimal(18,6)")


def _charge():
    return (
        _disc_price() * (F.lit(1) + F.col("l_tax").cast("decimal(8,4)"))
    ).cast("decimal(20,6)")


@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({_CHARGE_SQL}), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
    bench=True,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: one scan, map-side partial agg, 6-group
    final agg. The shipdate filter pushes to parquet; only 7 of 11 columns
    are read (ReadSchema pruning)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty", 12, 2),
            dsum(F.col("l_extendedprice"), "sum_base_price", 14, 2),
            F.round(F.sum(_disc_price()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_charge()), 2).cast("double").alias("sum_charge"),
            davg(F.col("l_quantity"), "avg_qty", 12, 2),
            davg(F.col("l_extendedprice"), "avg_price", 14, 2),
            davg(F.col("l_discount"), "avg_disc", 8, 4),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: broadcast the filtered customer dim into orders, sort-merge
    orders ⋈ lineitem on the fact key, then top-10 via TakeOrdered."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz"))
    li = t["lineitem"].where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        # cast ntz→session-tz timestamp (UTC): same wall-clock value, but the
        # output type matches the oracle engine's TIMESTAMP exactly
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("timestamp").alias("o_orderdate"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_region_volume",
    oracle=f"""
    SELECT n_name, CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def tpch_q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: five-way join. region→nation→supplier collapse into one
    broadcast dim; the only shuffle joins are the two fact joins."""
    t = load_tables(spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem")
    dim = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q6_revenue_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
    bench=True,
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg; every predicate pushes to parquet so
    row groups outside the year/discount/quantity bounds never decompress."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "brand_revenue_broadcast",
    oracle=f"""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("join", "agg", "broadcast"),
)
def brand_revenue_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join of the part dimension into the fact scan: the
    lineitem table never shuffles for the join — only the final 25-group agg."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"),
            davg(F.col("l_quantity"), "avg_qty", 12, 2),
        )
        .orderBy("p_brand")
    )


@register(
    "semi_join_big_spenders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS (SURVEY.md §2.3): customer rows pass through
    once, never duplicated, and only the join key shuffles."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    big = t["orders"].where(F.col("o_totalprice") > 150000).select("o_custkey")
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "anti_join_quiet_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS — the dedup/quarantine workhorse.

    (Filter on urgent orders keeps the result non-empty at every sf — an
    all-customers NOT EXISTS is vacuously empty in this dataset.)"""
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("window", "topk"),
    bench=True,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window (SURVEY.md §2.5 — absent in the
    reference). One shuffle on the partition key; the unique o_orderkey
    tie-break makes output deterministic under any parallelism."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_running_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
    FROM lineitem WHERE l_suppkey <= 3
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    tags=("window",),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per supplier over a cumulative ROWS frame. The order
    key ends with the summed measure itself (l_extendedprice), so even if
    every other key column ties — (orderkey, linenumber) is NOT unique in
    this synthetic data — the tied rows contribute equal values and the
    prefix-sum multiset is order-invariant; DECIMAL keeps sums exact at any
    partitioning."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 3)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_extendedprice", 14, 2)).over(w).cast("double").alias("running_revenue"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@register(
    "window_trailing_30d_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
    FROM lineitem WHERE l_suppkey <= 2
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    tags=("window", "rangeframe"),
)
def window_trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (trailing 30-day revenue per supplier) —
    the value-based frame PySpark's rangeBetween can't express numerically,
    written as a SQL window over the DataFrame. RANGE frames are
    tie-inclusive, so the result is deterministic without a unique order key
    (all rows with equal shipdate get the same frame)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 2)
    return li.selectExpr(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        """CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d""",
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    tags=("agg", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers — the markers
    disambiguate subtotal NULLs from genuine NULL group keys, which rollup
    consumers need at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               count(*) AS n_items
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
        """
    )


@register(
    "agg_rollup_returnflag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total) — free in Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"), dsum(F.col("l_quantity"), "sum_qty", 12, 2)
    )


@register(
    "agg_cube_returnflag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"), dsum(F.col("l_extendedprice"), "sum_price", 14, 2)
    )


@register(
    "pivot_linestatus_qty",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def pivot_linestatus_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — no extra pass to discover pivot
    values (which would be a full scan at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity", 12, 2)))
        .select(
            "l_returnflag",
            F.col("O").cast("double").alias("qty_o"),
            F.col("F").cast("double").alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "set_intersect_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    ORDER BY c_custkey
    """,
    tags=("setop",),
)
def set_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.where(F.col("c_acctbal") > 1000).select("c_custkey")
    return a.intersect(b).orderBy("c_custkey")


@register(
    "set_except_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    ORDER BY c_custkey
    """,
    tags=("setop",),
)
def set_except_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.where(F.col("c_acctbal") > 1000).select("c_custkey")
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiset leftovers)
    return a.subtract(b).orderBy("c_custkey")


@register(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: semi join then small agg — the EXISTS side is reduced
    to its join key before shuffling."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    heavy = t["lineitem"].where(F.col("l_quantity") >= 45).select("l_orderkey")
    return (
        t["orders"]
        .join(heavy, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "sql_customer_revenue",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 25
    """,
    tags=("sql", "join", "agg"),
)
def sql_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL API surface (TPC-H Q10 shape): temp views + spark.sql —
    Catalyst produces the same plan as the DataFrame form, so the choice is
    purely ergonomic (SNIPPETS/guide)."""
    from arrow_parquet_logs_spark.sources.tables import register_views

    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 25
        """
    )


@register(
    "top15_expensive_items",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
    tags=("topk", "sort"),
)
def top15_expensive_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(15)
    )
