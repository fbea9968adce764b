"""Geospatial queries — geohash rollups, cell-bucketed radius joins,
bounded kNN joins (operators/geo.py).

Coordinates are derived deterministically from the portable md5 hash of the
entity key (functions/hashing.py), bounded to the ±60° latitude band the
grid operators are configured for — both engines compute bit-identical
doubles, so the spatial family hash-gates like everything else.

Oracle stance: the Spark plans are CELL-BUCKETED (one shuffle per side on
integer grid cells, 3x3-ring candidates, haversine refine — see
operators/geo.py for the scale argument); the DuckDB oracles are the
BRUTE-FORCE theta-join definition. A green hash therefore proves not just
value parity but the ring-completeness guarantee itself: if any true pair
escaped the 3x3 ring, the oracle would have it and the hash would differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.functions.hashing import hash64
from arrow_parquet_logs_spark.operators.geo import (
    geohash,
    geohash_sql,
    haversine_km_sql,
    knn_join,
    radius_join,
)
from arrow_parquet_logs_spark.queries.catalog import register
from arrow_parquet_logs_spark.sources.tables import load_table


def _coords(df: DataFrame, key: str) -> DataFrame:
    """lat in [-60, 60), lon in [-180, 180) from the portable hash of the
    key — uniform over the band, identical in both engines."""
    ks = F.col(key).cast("string")
    lat = (hash64(F.concat(F.lit("geolat:"), ks)) % F.lit(1_200_000)) / F.lit(10_000.0) - F.lit(60.0)
    lon = (hash64(F.concat(F.lit("geolon:"), ks)) % F.lit(3_600_000)) / F.lit(10_000.0) - F.lit(180.0)
    return df.withColumn("lat", lat).withColumn("lon", lon)


def _coords_sql(key: str) -> tuple[str, str]:
    h = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
    ks = f"CAST({key} AS VARCHAR)"
    hlat = h.format(x=f"concat('geolat:', {ks})")
    hlon = h.format(x=f"concat('geolon:', {ks})")
    lat = f"({hlat} % 1200000) / 10000.0 - 60.0"
    lon = f"({hlon} % 3600000) / 10000.0 - 180.0"
    return lat, lon


_LAT_C, _LON_C = _coords_sql("c_custkey")
_LAT_S, _LON_S = _coords_sql("s_suppkey")


# ---------------------------------------------------------------------------
# geohash rollup
# ---------------------------------------------------------------------------

@register(
    "geo_customer_geohash",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey, {_LAT_C} AS lat, {_LON_C} AS lon FROM customer
    ),
    gh AS (
        SELECT c_custkey, {geohash_sql('lat', 'lon', 7)} AS geohash7 FROM pts
    )
    SELECT substr(geohash7, 1, 2) AS gh2,
           CAST(count(*) AS BIGINT) AS n_customers,
           min(geohash7) AS first_hash
    FROM gh
    GROUP BY 1
    ORDER BY n_customers DESC, gh2
    LIMIT 20
    """,
    tags=("geo", "geohash"),
)
def geo_customer_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical spatial rollup: full-precision geohash-7 per customer
    (pure shift/mask codegen — operators/geo.py:geohash), aggregated by
    its 2-char prefix. Prefix truncation IS the hierarchy — no re-encode
    at coarser precision, which is what makes geohash the right key for
    multi-resolution tiling at 100 TB (one encode, every zoom level)."""
    pts = _coords(load_table(spark, sf_dir, "customer").select("c_custkey"), "c_custkey")
    gh = pts.select(
        "c_custkey", geohash(F.col("lat"), F.col("lon"), 7).alias("geohash7")
    )
    return (
        gh.groupBy(F.substring("geohash7", 1, 2).alias("gh2"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.min("geohash7").alias("first_hash"),
        )
        .orderBy(F.desc("n_customers"), "gh2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# radius join
# ---------------------------------------------------------------------------

_RADIUS_KM = 500.0

@register(
    "geo_supplier_radius_join",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey, {_LAT_C} AS lat, {_LON_C} AS lon FROM customer
    ),
    supp AS (
        SELECT s_suppkey, {_LAT_S} AS lat, {_LON_S} AS lon FROM supplier
    ),
    pairs AS (
        SELECT c.c_custkey,
               {haversine_km_sql('c.lat', 'c.lon', 's.lat', 's.lon')} AS d
        FROM cust c JOIN supp s ON TRUE
    )
    SELECT c_custkey,
           CAST(count(*) AS BIGINT) AS n_nearby,
           CAST(floor(min(d) * 1000.0) AS BIGINT) AS nearest_m
    FROM pairs
    WHERE d <= {_RADIUS_KM!r}
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    tags=("geo", "join", "radius"),
    bench=True,
)
def geo_supplier_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers within 500 km of each customer: pair count + nearest
    distance (integer metres). Spark side is the cell-bucketed plan (one
    shuffle per side, 9-cell ring candidates); the oracle is the full
    brute-force theta-join — a green hash proves ring completeness."""
    cust = _coords(load_table(spark, sf_dir, "customer").select("c_custkey"), "c_custkey")
    supp = _coords(load_table(spark, sf_dir, "supplier").select("s_suppkey"), "s_suppkey")
    pairs = radius_join(cust, supp, _RADIUS_KM)
    return (
        pairs.groupBy("c_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_nearby"),
            F.floor(F.min("dist_km") * F.lit(1000.0)).cast("bigint").alias("nearest_m"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# bounded kNN join
# ---------------------------------------------------------------------------

_KNN_K = 3
_KNN_CAP_KM = 2000.0

@register(
    "geo_knn_suppliers",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey, {_LAT_C} AS lat, {_LON_C} AS lon
        FROM customer WHERE c_custkey % 31 = 0
    ),
    supp AS (
        SELECT s_suppkey, {_LAT_S} AS lat, {_LON_S} AS lon FROM supplier
    ),
    pairs AS (
        SELECT c.c_custkey, s.s_suppkey,
               {haversine_km_sql('c.lat', 'c.lon', 's.lat', 's.lon')} AS d
        FROM cust c JOIN supp s ON TRUE
    ),
    ranked AS (
        SELECT c_custkey, s_suppkey,
               CAST(floor(d * 1000000.0) AS BIGINT) AS dist_mm,
               row_number() OVER (PARTITION BY c_custkey
                                  ORDER BY CAST(floor(d * 1000000.0) AS BIGINT),
                                           s_suppkey) AS nn_rank
        FROM pairs
        WHERE d <= {_KNN_CAP_KM!r}
    )
    SELECT c_custkey, nn_rank, s_suppkey,
           CAST(dist_mm // 1000 AS BIGINT) AS dist_m
    FROM ranked
    WHERE nn_rank <= {_KNN_K}
    ORDER BY c_custkey, nn_rank
    """,
    tags=("geo", "join", "knn"),
)
def geo_knn_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 nearest suppliers (within a 2000 km cap) per sampled customer.
    The cap bounds the candidate ring (operators/geo.py:knn_join — the
    same bound production spatial engines impose); rank ties break on
    millimetre-quantized distance then supplier id, so the ranking is
    deterministic across engines and partitionings."""
    cust = _coords(
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 31 == 0)
        .select("c_custkey"),
        "c_custkey",
    )
    supp = _coords(load_table(spark, sf_dir, "supplier").select("s_suppkey"), "s_suppkey")
    nn = knn_join(cust, supp, _KNN_K, _KNN_CAP_KM, "c_custkey", "s_suppkey")
    return (
        nn.select(
            "c_custkey",
            "nn_rank",
            "s_suppkey",
            F.expr("dist_mm div 1000").alias("dist_m"),
        )
        .orderBy("c_custkey", "nn_rank")
    )
