"""TPC-H query shapes 7/8/13/14/15/16/18/19/22 over the driver's star schema.

The reference has no joins or aggregation at all (SURVEY.md §2.3-§2.4 — its
only aggregate is a filtered COUNT, reference reader.py:181-206), so this
whole family is extension surface: each query here pins down one classic
relational plan shape the engine must produce well at 100 TB:

- Q7/Q8: multi-way star joins — every dimension side broadcast, the single
  fact-fact join (orders ⋈ lineitem) shuffles once on the order key;
- Q13: left outer + two-level aggregation (count-of-counts histogram);
- Q14: conditional aggregation (CASE inside SUM) over a pushed date range;
- Q15: aggregate → scalar-max selection via a broadcast cross-join (no
  single-partition window, which would serialize at scale);
- Q16: count(DISTINCT) with dimension exclusion filters;
- Q18: HAVING-filtered semi-join feeding a top-k;
- Q19: OR-of-ANDs disjunctive predicate — Catalyst pushes the common
  p_partkey equi-join and evaluates the disjunction post-join, with the
  per-branch part filters pushed into the part scan;
- Q22: scalar-subquery threshold + anti-join (dormant rich customers).

Driver tables lack partsupp / l_shipmode / l_commitdate, so queries needing
those columns (Q2/Q9/Q11/Q12/Q20/Q21) are adapted or out of scope; the
shapes kept here cover the same physical-plan space. Determinism follows
queries.catalog rules: DECIMAL money aggregation, aliases identical in both
engines, total order before any LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.functions.numeric import dec
from arrow_parquet_logs_spark.queries.catalog import register
from arrow_parquet_logs_spark.queries.tpch import _DISC_PRICE_SQL, _disc_price
from arrow_parquet_logs_spark.sources.tables import load_table, load_tables


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year, {_DISC_PRICE_SQL} AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year between two nations.

    Physical intent: customer/supplier/nation are broadcast (the nation
    filter makes them tiny), so the only shuffle is orders ⋈ lineitem on the
    order key; the disjunctive nation-pair predicate is evaluated after the
    broadcast joins, before aggregation."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .select("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"),
                _disc_price().alias("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year, {_DISC_PRICE_SQL} AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of PROMO-part revenue sold into EUROPE,
    per order year.

    Seven-table star join where every dimension side (part, customer,
    supplier, nation ×2, region) broadcasts; numerator and denominator are
    computed in one aggregation pass via conditional DECIMAL sums, then a
    single double division — no second scan, no re-shuffle."""
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "part", "nation", "region"
    )
    n1 = t["nation"].select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,6)")
    base = (
        t["lineitem"]
        .join(F.broadcast(t["part"].where(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
              F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(F.year("o_orderdate").alias("o_year"), _disc_price().alias("volume"),
                "supp_nation")
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero))
    return (
        base.groupBy("o_year")
        .agg((num.cast("double") / F.sum("volume").cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "outer", "tpch"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer (count-of-counts).

    Left outer join keeps order-less customers as c_count=0 (count() of the
    null key column counts no rows — exactly the SQL semantics). Two-level
    aggregation: the first shuffles on c_custkey, the second on the tiny
    c_count domain; both have map-side partial aggregation."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                                  ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
             / CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts.

    The month predicate pushes to the lineitem parquet scan (row-group
    skipping on l_shipdate min/max); part broadcasts; single aggregation
    computes both conditional and total sums."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero))
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.round(promo, 2).cast("double")
                / F.round(F.sum(_disc_price()), 2).cast("double")
            ).alias(
                "promo_revenue"
            )
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "scalar-subquery", "tpch"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the max quarterly revenue.

    The scalar max is attached via a broadcast cross-join of a 1-row
    aggregate — never a partitionBy()-less window, which would funnel every
    revenue row through one task at scale. Equality on total_revenue is safe
    because both sides are the identical DECIMAL-sum-cast-double value."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
        # referenced from two DAG branches (join leg + scalar max) — persist
        # or the lineitem scan+agg runs twice inside one action
        .persist()
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "agg", "distinct", "tpch"),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (partsupp → lineitem adaptation): how many distinct
    suppliers ship each surviving (brand, type, size) combination.

    Exclusion predicates stay on the broadcast part side and prune before
    the join; count(DISTINCT) expands to a two-phase aggregate (distinct on
    (group, l_suppkey) then count) — both phases partial-agg on the map
    side. The driver schema has no partsupp table, so lineitem supplies the
    part↔supplier relation (reference has neither: SURVEY.md §2.3)."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    p = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("join", "semi", "having", "topk", "tpch"),
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose orders exceed 300 total quantity, top 20
    by order value.

    The IN-subquery becomes a HAVING-filtered aggregate left-semi-joined to
    orders *before* the customer join, so only qualifying orders (≈1% of
    them) ever reach the wide join. LIMIT is preceded by a total order
    (o_totalprice desc, o_orderkey unique) per catalog determinism rules."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"),
              "left_semi")
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity", 12, 2)).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "disjunctive", "tpch"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR-of-ANDs predicate mixing part and
    lineitem columns.

    Catalyst keeps the equi-join on p_partkey and extracts the
    join-side-local parts of the disjunction: the brand/size union pushes
    into the (broadcast) part scan, the quantity bounds into the lineitem
    scan, with the full disjunction re-checked post-join. One broadcast, one
    aggregation, no shuffle of lineitem."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    branch = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .where(branch)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q22_dormant_rich_customers",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("join", "anti", "scalar-subquery", "agg", "tpch"),
)
def tpch_q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adaptation: above-average-balance customers with no orders
    since 2000, grouped by nation (driver schema has no phone column, so
    nationkey stands in for the phone country code; 'dormant since 2000'
    stands in for 'never ordered', which is empty on this data).

    Shape: scalar-subquery threshold (broadcast 1-row aggregate), anti-join
    against a date-filtered order-key set, then a small aggregation. The
    threshold average is DECIMAL-sum/count so both engines compute the
    identical double and the > comparison can't flap."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .where(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal", 12, 2)).cast("double") / F.count(F.lit(1))).alias("thr"))
    )
    recent = (
        t["orders"]
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("thr"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "window_rank_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS INT)    AS quartile,
           round(percent_rank() OVER w, 6)     AS pct_rank,
           round(cume_dist()    OVER w, 6)     AS cdist,
           lag(o_totalprice)  OVER w           AS prev_price,
           lead(o_totalprice) OVER w           AS next_price
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rnk, o_orderkey
    """,
    tags=("window",),
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function library over one window spec — rank /
    dense_rank / ntile / percent_rank / cume_dist / lag / lead. One shuffle
    on the partition key serves all seven functions (Spark plans a single
    Window operator when the spec is shared); the order key carries a
    unique tie-break so every engine ranks identically. Fractional ranks
    are rounded to absorb double division noise."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
        )
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@register(
    "set_except_all_nations",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    tags=("setop",),
)
def set_except_all_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): nation keys of BUILDING customers
    minus, occurrence-for-occurrence, those of AUTOMOBILE customers —
    duplicate-preserving semantics DISTINCT-based EXCEPT loses. Spark plans
    a single hash aggregation on (value, count) pairs; same one shuffle as
    the distinct form."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.exceptAll(b)


@register(
    "orders_calendar_breakdown",
    oracle="""
    SELECT year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY yr, qtr, dow
    """,
    tags=("agg", "datetime"),
)
def orders_calendar_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function breadth over one aggregation: year / quarter /
    day-of-week rollup. Engines disagree on week-day numbering — Spark's
    dayofweek is 1=Sunday, DuckDB's is 0=Sunday — so the Spark side aligns
    with an explicit -1 (the kind of silent cross-engine divergence the
    oracle harness exists to catch)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 14, 2)).cast("double").alias("total_value"),
        )
        .orderBy("yr", "qtr", "dow")
    )


@register(
    "full_outer_segment_order_balance",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
    ords AS (
        SELECT o_custkey,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS spent
        FROM orders GROUP BY o_custkey)
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           CAST(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS INT) AS in_segment,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           round(COALESCE(o.spent, 0.0), 2) AS total_spent
    FROM cust c FULL OUTER JOIN ords o ON c.c_custkey = o.o_custkey
    ORDER BY custkey
    """,
    tags=("join", "full-outer"),
)
def full_outer_segment_order_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join coverage: the high-balance customer segment against
    per-customer order totals — unmatched rows survive on BOTH sides
    (rich customers who never ordered, and orders from low-balance
    customers). One shuffle on the shared custkey; the aggregate side
    pre-reduces before the join so the outer join sees one row per key."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 14, 2)).cast("double").alias("spent"),
        )
    )
    joined = cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), F.lit(0)).otherwise(F.lit(1)).cast("int").alias(
            "in_segment"
        ),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.round(F.coalesce("spent", F.lit(0.0)), 2).alias("total_spent"),
    ).orderBy("custkey")


@register(
    "window_value_anchors",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           round(o_totalprice - first_value(o_totalprice) OVER w, 2) AS drift_from_first
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "anchors"),
)
def window_value_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value anchor functions over a unique
    (date, key) ordering — completes the window-function library next to
    the ranking/offset families. One shuffle on the partition key; the
    full-frame last_value is the only whole-partition buffer."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    run = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    full = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(run).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(run).alias("second_price"),
        F.round(F.col("o_totalprice") - F.first("o_totalprice").over(run), 2).alias(
            "drift_from_first"
        ),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "region_nation_listagg",
    oracle="""
    SELECT r.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_nations,
           array_to_string(list_sort(list(n.n_name)), ',') AS nations_csv
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
    tags=("agg", "listagg", "string"),
)
def region_nation_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (LISTAGG / string_agg): nation names per region as
    a sorted CSV — collect_list is partition-order-dependent, so the sort
    inside the expression is what makes the output deterministic at any
    parallelism. Broadcast dimension join, one agg shuffle."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
        )
        .orderBy("region")
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS retail_value,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE)
             - CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * 0.8
             AS profit
    FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               l_extendedprice, l_discount, p_retailprice, l_quantity
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): product-line profit by supplier nation and year.

    The driver tables have no partsupp, so ps_supplycost is approximated as
    80% of p_retailprice — same plan shape as the genuine Q9: a lineitem
    fact joined to orders on the order key (the one shuffle) with part /
    supplier / nation broadcast, a LIKE filter pushed into the part scan,
    and a two-key rollup. Money sums are DECIMAL-exact; the 0.8 factor is
    applied once to the aggregated double (fixed op order on both engines)."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part")
    retail = dec("p_retailprice", 12, 2) * dec("l_quantity", 12, 2)
    out = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["part"].where(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("vol"),
            retail.alias("retail"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum("vol").cast("double").alias("revenue"),
            F.sum("retail").cast("double").alias("retail_value"),
        )
    )
    return out.select(
        "nation", "o_year", "revenue", "retail_value",
        (F.col("revenue") - F.col("retail_value") * F.lit(0.8)).alias("profit"),
    ).orderBy("nation", F.col("o_year").desc())


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returned items in one
    quarter. The quarter predicate pushes into the orders scan, the
    returnflag predicate into lineitem; customer/nation broadcast; one
    shuffle on the order key, then TakeOrdered for the top 20 (total order:
    revenue desc, custkey)."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", F.col("c_acctbal").cast("double").alias("acctbal"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q21_sole_late_supplier",
    oracle="""
    WITH l AS (
        SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    late AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM l
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    ),
    multi AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) >= 2
    ),
    sole AS (
        SELECT lt.l_orderkey, lt.l_suppkey
        FROM late lt JOIN multi USING (l_orderkey)
        WHERE NOT EXISTS (
            SELECT 1 FROM late lt2
            WHERE lt2.l_orderkey = lt.l_orderkey AND lt2.l_suppkey != lt.l_suppkey
        )
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM sole JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
    tags=("join", "semi", "anti", "tpch"),
)
def tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted): suppliers who were the SOLE late shipper on
    multi-supplier orders. The driver tables lack commit/receipt dates, so
    "late" is shipdate > orderdate + 60 days — the plan shape is the
    genuine Q21's: a fact-fact join to establish lateness, then a
    semi-join (some other supplier exists on the order) and an anti-join
    (no other LATE supplier on the order) against the same derived
    relation, all co-keyed on the order key so the three hash joins share
    one shuffle partitioning; supplier broadcast at the end."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    late = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("_ns"))
        .where(F.col("_ns") >= 2)
        .select("l_orderkey")
    )
    a = late.alias("a")
    b = late.select(
        F.col("l_orderkey").alias("b_ok"), F.col("l_suppkey").alias("b_sk")
    ).alias("b")
    sole = (
        a.join(multi, "l_orderkey", "left_semi")
        .join(
            b,
            (F.col("a.l_orderkey") == F.col("b_ok")) & (F.col("a.l_suppkey") != F.col("b_sk")),
            "left_anti",
        )
    )
    return (
        sole.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "sql_correlated_subqueries",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer c
    WHERE c_acctbal > (
            SELECT (2.0 * CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)) / (1000.0 * count(*))
            FROM orders o WHERE o.o_custkey = c.c_custkey
          )
      AND EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o3
            WHERE o3.o_custkey = c.c_custkey AND o3.o_orderstatus = 'P'
          )
    ORDER BY c_custkey
    """,
    tags=("sql", "subquery", "semi", "anti"),
)
def sql_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery surface through the SQL API, in all three forms
    at once: a correlated SCALAR subquery (per-customer order-value
    threshold — DECIMAL-exact sum then a fixed-order double division, so
    the threshold is partition-order-invariant), a correlated EXISTS, and a correlated NOT EXISTS. Catalyst
    decorrelates each into joins — the scalar into an aggregate + left
    join, EXISTS/NOT EXISTS into left-semi/left-anti — all co-keyed on
    c_custkey, so the three 'per-row subqueries' cost three hash joins on
    one key, not N query executions. The same SQL text runs verbatim as
    the DuckDB oracle."""
    from arrow_parquet_logs_spark.sources.tables import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer c
        WHERE c_acctbal > (
                SELECT (2.0 * CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)) / (1000.0 * count(*))
                FROM orders o WHERE o.o_custkey = c.c_custkey
              )
          AND EXISTS (
                SELECT 1 FROM orders o2
                WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o3
                WHERE o3.o_custkey = c.c_custkey AND o3.o_orderstatus = 'P'
              )
        ORDER BY c_custkey
        """
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, min(min_price) AS best_price FROM cost GROUP BY l_partkey
    )
    SELECT p.p_partkey, s.s_name, s.s_acctbal, n.n_name,
           CAST(c.min_price AS DOUBLE) AS best_price
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.min_price = b.best_price
    JOIN part p ON p.p_partkey = c.l_partkey AND p.p_size = 15 AND p.p_type = 'SMALL'
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    """,
    tags=("join", "tpch", "correlated", "decorrelation"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier), adapted: the driver schema has no
    partsupp, so supply cost is the supplier's minimum observed price for
    the part (MIN over their lineitems — exact under any partitioning, no
    summation). The correlated `= (SELECT min(..) WHERE part matches)`
    decorrelates into aggregate → self-join on (partkey, min), the classic
    Q2 physical plan; part/supplier/nation dims broadcast."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    cost = t["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    # rename the derived side's key: a self-derived frame's cost["l_partkey"]
    # and best["l_partkey"] resolve to the SAME attribute and Spark folds the
    # equality to trivially-true — the join would silently degrade to
    # price-only matching
    best = cost.groupBy("l_partkey").agg(F.min("min_price").alias("best_price")
                                         ).withColumnRenamed("l_partkey", "b_partkey")
    dims = t["part"].where((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
    return (
        cost.join(best, (F.col("l_partkey") == F.col("b_partkey"))
                  & (F.col("min_price") == F.col("best_price")))
        .drop("b_partkey")
        .join(F.broadcast(dims), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey", "s_name", "s_acctbal", "n_name",
            F.col("min_price").cast("double").alias("best_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


@register(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("join", "tpch", "semi", "exists"),
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): count one quarter's orders
    having at least one LATE line — adapted lateness is shipment >60 days
    after the order date (the driver schema has no l_commitdate). The
    EXISTS plans as a LEFT SEMI join on the order key with the extra
    cross-side date condition evaluated in the join — one shuffle, no
    duplicate-order inflation, the Q4 physical plan."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q11_important_suppliers",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, SUM({_DISC_PRICE_SQL}) AS value
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, CAST(value AS DOUBLE) AS value
    FROM rev
    WHERE value * 200 > (SELECT SUM(value) FROM rev)
    ORDER BY value DESC, l_suppkey
    """,
    tags=("agg", "tpch", "scalar-subquery", "having"),
)
def tpch_q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock value): per-group value filtered
    against a fraction of the GLOBAL total — adapted to supplier revenue
    (no partsupp in the driver schema). Two aggregations over one scan
    shape: the per-supplier rollup joins a broadcast 1-row total; DECIMAL
    sums keep the threshold comparison exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("value"))
    # threshold comparison in EXACT decimal (value*200 > total): the old
    # decimal*0.005 promoted to DOUBLE, and decimal->double conversion of a
    # >2^53-significand total is not bit-identical across engines
    total = rev.agg(F.sum("value").alias("threshold"))
    return (
        rev.crossJoin(F.broadcast(total))
        .where(F.col("value") * 200 > F.col("threshold"))
        .select("l_suppkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_suppkey")
    )


@register(
    "tpch_q12_shipping_latency",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "tpch", "conditional-agg"),
)
def tpch_q12_shipping_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and priority): conditional counts of
    high/low-priority lines per shipping class — adapted classes are
    LATE/ONTIME against a 90-day latency (no l_shipmode in the driver
    schema). One fact-fact equi-join with the year predicate pushed to the
    orders scan, CASE counts folded into a single aggregation — Q12's
    physical plan exactly."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        o.join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(late, "LATE").otherwise("ONTIME").alias("ship_class"),
            F.when(high, 1).otherwise(0).alias("h"),
            F.when(high, 0).otherwise(1).alias("l"),
        )
        .groupBy("ship_class")
        .agg(F.sum("h").alias("high_line_count"), F.sum("l").alias("low_line_count"))
        .orderBy("ship_class")
    )


@register(
    "tpch_q20_excess_suppliers",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q_ps
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    p_tot AS (
        SELECT l_partkey, SUM(q_ps) AS q_p FROM ps GROUP BY l_partkey
    ),
    dominant AS (
        SELECT DISTINCT ps.l_suppkey
        FROM ps
        JOIN p_tot ON ps.l_partkey = p_tot.l_partkey
        JOIN part ON p_partkey = ps.l_partkey AND p_type = 'PROMO'
        WHERE ps.q_ps * 2 > p_tot.q_p
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN dominant ON s_suppkey = l_suppkey
    ORDER BY s_suppkey
    """,
    tags=("join", "tpch", "semi", "nested-agg"),
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-inventory suppliers): suppliers who shipped
    MORE THAN HALF of some PROMO part's total quantity — adapted from
    partsupp availability to shipped-quantity dominance. The nested
    aggregate subquery (per-(part,supp) sums vs per-part totals) reuses
    one shuffle's output for both levels, the part filter broadcasts, and
    the supplier probe is a semi join — Q20's nested-semi plan. DECIMAL
    quantity sums keep the 2× comparison exact."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    ps = t["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity", 18, 2)).alias("q_ps")
    )
    p_tot = ps.groupBy("l_partkey").agg(F.sum("q_ps").alias("q_p"))
    promo = t["part"].where(F.col("p_type") == "PROMO").select("p_partkey")
    dominant = (
        ps.join(p_tot, "l_partkey")
        .join(F.broadcast(promo), F.col("p_partkey") == F.col("l_partkey"))
        .where(F.col("q_ps") * 2 > F.col("q_p"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


_RCTE_SQL = """
    WITH RECURSIVE chain AS (
        SELECT c_custkey AS start_key, c_custkey AS cur,
               0 AS depth, CAST(c_acctbal AS DOUBLE) AS path_balance
        FROM customer WHERE c_custkey % 211 = 0
        UNION ALL
        SELECT ch.start_key, c.c_custkey, ch.depth + 1,
               ch.path_balance + CAST(c.c_acctbal AS DOUBLE)
        FROM chain ch
        JOIN customer c ON c.c_custkey = CAST(floor(ch.cur / 7) AS BIGINT)
        WHERE ch.cur > 0
    )
    SELECT c_custkey, chain_depth, path_balance FROM (
        SELECT start_key AS c_custkey, CAST(depth AS INTEGER) AS chain_depth,
               path_balance,
               ROW_NUMBER() OVER (PARTITION BY start_key ORDER BY depth DESC) AS rn
        FROM chain
    ) WHERE rn = 1 ORDER BY c_custkey
"""


@register(
    "sql_recursive_cte",
    oracle=_RCTE_SQL,
    tags=("sql", "recursive", "cte", "iterative", "spark4"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL API (new in Spark 4): walk each
    seed customer up an implicit 7-ary hierarchy (parent key = key DIV 7)
    to the root, accumulating account balance along the path; report the
    chain depth and path sum per seed. The same SQL text runs verbatim as
    the DuckDB oracle — the accumulation order along a chain is fixed by
    the recursion itself, so the double path sums are bit-identical.

    Scale shape: each recursive step is one equi-join of the frontier
    (seed count, never corpus-sized) against the customer table —
    depth ≈ log₇(keys) iterations of a broadcast-able join, the same
    bounded-iteration discipline as connected components' pointer
    jumping; no unbounded frontier growth because each row has exactly
    one parent."""
    from arrow_parquet_logs_spark.sources.tables import register_views

    register_views(spark, sf_dir, "customer")
    return spark.sql(_RCTE_SQL)


@register(
    "part_skyline_price_size",
    oracle="""
    SELECT p.p_partkey, p.p_brand, CAST(p.p_size AS INTEGER) AS p_size,
           p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
        AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
    )
    ORDER BY p.p_partkey
    """,
    tags=("skyline", "pareto", "multi-criteria"),
    bench=True,
)
def part_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of the part catalog — biggest-for-the-money parts
    (maximize p_size, minimize p_retailprice), the multi-criteria
    shortlist every procurement/ranking surface wants without scoring
    weights. Runs the operator's 2-criteria DECLARATIVE plan
    (operators/skyline.py:_skyline_2d): one partial-agg shuffle to a
    distinct-size frame, one running-best window over that frame (never
    the input), and a broadcast of the frontier back onto the rows —
    Catalyst codegen throughout, nothing quadratic anywhere. The oracle
    IS the quadratic NOT EXISTS dominance definition, so the reduction's
    correctness (ties kept, duplicates kept, strictness on at least one
    criterion) is hash-gated against the textbook semantics."""
    from arrow_parquet_logs_spark.operators.skyline import skyline

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand",
        F.col("p_size").cast("int").alias("p_size"), "p_retailprice",
    )
    return skyline(part, maximize=["p_size"], minimize=["p_retailprice"]).orderBy(
        "p_partkey"
    )


@register(
    "lineitem_skyline_3d",
    oracle="""
    WITH sub AS MATERIALIZED (
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
      FROM lineitem WHERE l_suppkey <= 5
    )
    SELECT p.l_orderkey, CAST(p.l_linenumber AS INTEGER) AS l_linenumber,
           p.l_quantity, p.l_discount, p.l_extendedprice
    FROM sub p
    WHERE NOT EXISTS (
      SELECT 1 FROM sub q
      WHERE q.l_quantity >= p.l_quantity AND q.l_discount >= p.l_discount
        AND q.l_extendedprice <= p.l_extendedprice
        AND (q.l_quantity > p.l_quantity OR q.l_discount > p.l_discount
             OR q.l_extendedprice < p.l_extendedprice)
    )
    ORDER BY p.l_orderkey, l_linenumber
    """,
    tags=("skyline", "pareto", "multi-criteria", "pandas"),
)
def lineitem_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-criteria skyline (maximize quantity AND discount, minimize
    price) over one supplier group's lineitems — the d>2 regime where no
    window reduction exists, exercising the operator's two-phase
    SORT-FILTER-SKYLINE path: each partition prunes itself to its local
    frontier with a monotone-score scan (work n·|frontier|, never n²),
    and only the frontier-sized survivors gather for the exact second
    pass. The oracle replays the quadratic dominance definition over the
    same subset; Arrow float64 carries the double criteria exactly, so
    the hash gate is strict."""
    from arrow_parquet_logs_spark.operators.skyline import skyline

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_suppkey") <= 5)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            "l_quantity", "l_discount", "l_extendedprice",
        )
    )
    return skyline(
        li,
        maximize=["l_quantity", "l_discount"],
        minimize=["l_extendedprice"],
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "linkage_customer_names",
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT c_custkey, c_name,
             row_number() OVER (ORDER BY c_name, c_custkey) AS rn
      FROM customer
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS key_a, b.c_name AS key_b,
           jaro_winkler_similarity(a.c_name, b.c_name) AS jw
    FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
    WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.97
    ORDER BY id_a, id_b
    """,
    tags=("linkage", "jaro-winkler", "sorted-neighborhood", "pandas"),
)
def linkage_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over customer names (operators/linkage.py): sorted-
    neighborhood candidate generation — O(n·w) pairs, never the n² cross
    join — scored with Jaro-Winkler and thresholded at 0.97. The query
    runs the RANGE-PARTITIONED exact regime (per-bucket lead windows +
    boundary-bridging tail×head pairs), the form that parallelizes at
    corpus scale; its pair set is pinned identical to the single-window
    spec form by tests.

    The oracle is the strongest kind available: DuckDB's BUILT-IN
    ``jaro_winkler_similarity`` versus this engine's from-scratch
    implementation — an independent implementation of the public
    definition, matched BIT-FOR-BIT (standard Winkler: p=0.1, 4-char
    prefix cap, 0.7 boost threshold, empty-vs-empty = 0), with no
    quantization hiding drift. Scoring runs Arrow-batched (pandas UDF);
    the matching-window scan has no Catalyst form."""
    from arrow_parquet_logs_spark.operators.linkage import link_sorted_neighborhood

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = link_sorted_neighborhood(
        cust, key_col="c_name", id_col="c_custkey",
        window=3, threshold=0.97, partitions=8,
    )
    return out.select(
        F.col("id_a"), F.col("id_b"),
        F.col("key_a"), F.col("key_b"), F.col("jw"),
    ).orderBy("id_a", "id_b")


_FK_RELS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "tpch_fk_integrity_audit",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}.{ck}' AS fk, '{p}.{pk}' AS refs,
           (SELECT CAST(count(*) AS BIGINT) FROM {c}) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM {c}
            WHERE {ck} IS NOT NULL
              AND {ck} NOT IN (SELECT {pk} FROM {p})) AS n_orphans,
           (SELECT CAST(count(*) AS BIGINT) FROM {c} WHERE {ck} IS NULL) AS n_nulls
        """
        for c, ck, p, pk in _FK_RELS
    )
    + "\n    ORDER BY fk, refs",
    tags=("data-quality", "audit", "referential-integrity", "anti-join"),
)
def tpch_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the whole star schema in one
    result: for each of the seven FK relationships, total child rows,
    ORPHANS (non-null keys with no parent — the load-order/partial-
    ingest smell), and NULL keys, via broadcast/shuffle anti-joins. The
    audit any warehouse runs after a backfill; here it also pins the
    test generator's own integrity (every count must be exactly
    reproduced by the oracle's NOT IN replay, so a generator regression
    that orphans keys fails the round loudly). Each relationship is one
    anti-join + counts; dimensions broadcast, the three lineitem-side
    audits share the fact scan cost shape."""
    out = None
    for child, ck, parent, pk in _FK_RELS:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(F.col(pk))
        orphans = (
            c.where(F.col(ck).isNotNull())
            .join(p, c[ck] == p[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        )
        row = (
            c.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col(ck).isNull(), 1).otherwise(0))
                .cast("long").alias("n_nulls"),
            )
            .crossJoin(F.broadcast(orphans))
            .select(
                F.lit(f"{child}.{ck}").alias("fk"),
                F.lit(f"{parent}.{pk}").alias("refs"),
                "n_rows", "n_orphans", "n_nulls",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk", "refs")
