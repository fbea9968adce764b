"""Geospatial operators: geohash encoding, cell-bucketed radius joins,
bounded k-nearest-neighbour joins.

Reference parity: the reference engine has no spatial surface; this family
exists for the training-data-platform mandate (geo-tagged corpora: dedupe
by location, join points-of-interest metadata onto documents, density
screens). Everything here is pure Catalyst codegen — bit arithmetic and
closed-form trigonometry, no UDFs — and every output is replayable in
ANSI SQL, so the DuckDB oracle gates it like any other family.

Scale design (the 100 TB story):

- **Never a cross join.** A radius join buckets both sides onto an integer
  grid whose cell edge is >= the search radius (latitude-compensated), so
  every true pair lies in the probe cell or one of its 8 neighbours. Each
  side shuffles ONCE on the cell id; candidates are ring-bounded (9 cells),
  then refined with exact haversine. Candidate count grows with local
  density x ring area — never |L| x |R|.
- **kNN is bounded.** `knn_join` is k-nearest *within a cap radius* — the
  cap is what makes the candidate set provably ring-local. Uncapped global
  kNN over an arbitrary metric cannot prune; production systems (BigQuery
  ST_* , Sedona) impose the same bound or pay a broadcast index.
- **Geohash is integer bit-interleave** — the Morton curve (layout.py) in
  base32 clothing. Encoding is shift/mask codegen; prefix truncation gives
  hierarchical aggregation (a geohash-4 rollup is `substr(gh, 1, 4)`), and
  Z-order file clustering on the same code makes lat/lon range predicates
  row-group-prunable.

Determinism: coordinates in the query registry derive from the portable
md5 hash (functions/hashing.py), so both engines see bit-identical doubles.
Haversine runs through libm on both sides; outputs quantize to integer
metres (floor) and rank ties break on the id column, so a last-ulp libm
divergence would need a candidate pair within ~1e-7 m of a boundary to
flip anything — probability ~0 under hash-derived coordinates (same
argument as the rounded-ratio convention, README "Deterministic down to
the bit").
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
#: km per degree of latitude (and of longitude at the equator)
KM_PER_DEG = 111.19492664455873  # 2*pi*R/360 for R = EARTH_RADIUS_KM

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


# ---------------------------------------------------------------------------
# haversine distance — closed form, identical expression shape in SQL
# ---------------------------------------------------------------------------

def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (degree) coordinate pairs.

    2R·asin(sqrt(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))) — all doubles, all
    codegen. `sin(x)*sin(x)` instead of pow() keeps the expression identical
    to the oracle's text."""
    rad = F.lit(math.pi / 180.0)
    p1, p2 = lat1 * rad, lat2 * rad
    dphi = (lat2 - lat1) * rad / F.lit(2.0)
    dlam = (lon2 - lon1) * rad / F.lit(2.0)
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(p1) * F.cos(p2) * F.sin(dlam) * F.sin(dlam)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same haversine as SQL text (valid in DuckDB and Spark SQL)."""
    rad = repr(math.pi / 180.0)
    return (
        f"2.0 * {EARTH_RADIUS_KM!r} * asin(sqrt("
        f"sin(({lat2} - {lat1}) * {rad} / 2.0) * sin(({lat2} - {lat1}) * {rad} / 2.0)"
        f" + cos({lat1} * {rad}) * cos({lat2} * {rad})"
        f" * sin(({lon2} - {lon1}) * {rad} / 2.0) * sin(({lon2} - {lon1}) * {rad} / 2.0)"
        f"))"
    )


# ---------------------------------------------------------------------------
# grid bucketing
# ---------------------------------------------------------------------------

def cell_edge_deg(radius_km: float, max_abs_lat_deg: float) -> float:
    """Grid edge (degrees) such that one cell edge >= radius_km in BOTH
    axes anywhere with |lat| <= max_abs_lat_deg: longitude degrees shrink
    by cos(lat), so divide by the worst-case cosine. Caller data must
    respect the latitude band (the query registry's synthetic coordinates
    are bounded to ±60°)."""
    if not 0.0 <= max_abs_lat_deg < 90.0:
        raise ValueError("max_abs_lat_deg must be in [0, 90)")
    return radius_km / (KM_PER_DEG * math.cos(math.radians(max_abs_lat_deg)))


def lon_grid(radius_km: float, max_abs_lat_deg: float) -> tuple[int, float]:
    """(cell count, cell edge) for an EXACTLY-TILING longitude grid.

    n = floor(360 / minimum-safe-edge) equal cells of width 360/n >= the
    safe edge. Exact tiling is what makes antimeridian wrap sound: cell
    n-1 and cell 0 are genuine neighbours of full width, so ``(cx + dx)
    mod n`` never narrows the covered ring. (A floor-division grid on raw
    degrees leaves a final partial cell narrower than the radius — a pair
    straddling ±180° could then escape the 3x3 ring. The brute-force
    oracle is what forces this to be right: haversine itself is periodic
    in Δλ, so seam pairs are in the ground truth.)"""
    min_edge = cell_edge_deg(radius_km, max_abs_lat_deg)
    n = int(360.0 / min_edge)
    if n < 1:
        n = 1
    return n, 360.0 / n


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_cols: tuple[str, str] = ("lat", "lon"),
    right_cols: tuple[str, str] = ("lat", "lon"),
    max_abs_lat_deg: float = 60.0,
    dist_col: str = "dist_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — cell-bucketed.

    Plan shape: left explodes onto its cell + 8 neighbours (a 9-element
    literal array, no extra scan), right buckets onto its own cell; ONE
    shuffle per side on (cell_lat, cell_lon); haversine refine. The
    latitude edge is >= the radius in km, the longitude grid tiles 360°
    exactly with cells >= the radius at the worst |lat| in the band and
    wraps modulo-n at the antimeridian — so the 3x3 ring is a complete
    candidate set and the join is exact, not approximate. At 100 TB the
    shuffle keys are dense integers and AQE handles urban-cell skew like
    any hot key."""
    edge_lat = radius_km / KM_PER_DEG
    n_lon, edge_lon = lon_grid(radius_km, max_abs_lat_deg)
    llat, llon = left_cols
    rlat, rlon = right_cols

    def cy(lat: Column) -> Column:
        return F.floor(lat / F.lit(edge_lat)).cast("bigint")

    def cx(lon: Column) -> Column:
        c = F.floor((lon + F.lit(180.0)) / F.lit(edge_lon)).cast("bigint")
        return F.least(c, F.lit(n_lon - 1))  # lon = 180.0 exactly

    # n_lon < 3: ±1 offsets collide modulo n (duplicate candidate rows) —
    # enumerate each distinct cell exactly once instead.
    dxs = [-1, 0, 1] if n_lon >= 3 else list(range(n_lon))
    offs = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in dxs
    ])
    l = (
        left.withColumn("_off", F.explode(offs))
        .withColumn("_cy", cy(F.col(llat)) + F.col("_off.dy"))
        .withColumn(
            "_cx",
            (cx(F.col(llon)) + F.col("_off.dx") + F.lit(n_lon)) % F.lit(n_lon),
        )
        .drop("_off")
    )
    r = (
        right.withColumn("_cy", cy(F.col(rlat)))
        .withColumn("_cx", cx(F.col(rlon)))
    )

    d = haversine_km(F.col(f"l.{llat}"), F.col(f"l.{llon}"),
                     F.col(f"r.{rlat}"), F.col(f"r.{rlon}"))
    return (
        l.alias("l")
        .join(r.alias("r"), on=["_cy", "_cx"])
        .withColumn(dist_col, d)
        .where(F.col(dist_col) <= F.lit(float(radius_km)))
        .drop("_cy", "_cx")
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    cap_km: float,
    left_id: str,
    right_id: str,
    left_cols: tuple[str, str] = ("lat", "lon"),
    right_cols: tuple[str, str] = ("lat", "lon"),
    max_abs_lat_deg: float = 60.0,
) -> DataFrame:
    """k nearest right-rows per left-row, bounded to ``cap_km``.

    The cap is load-bearing: it makes the candidate set ring-local (one
    radius_join), so the work is density-bounded instead of |L|x|R|. Rank
    is a per-left-id window over (millimetre-quantized distance, right id)
    — fully deterministic. Left rows with no neighbour inside the cap are
    absent from the output (the caller left-joins if it needs them)."""
    pairs = radius_join(
        left, right, cap_km,
        left_cols=left_cols, right_cols=right_cols,
        max_abs_lat_deg=max_abs_lat_deg,
    )
    from pyspark.sql import Window
    dist_mm = F.floor(F.col("dist_km") * F.lit(1_000_000.0)).cast("bigint")
    w = Window.partitionBy(left_id).orderBy(dist_mm.asc(), F.col(right_id).asc())
    return (
        pairs.withColumn("dist_mm", dist_mm)
        .withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
    )


# ---------------------------------------------------------------------------
# geohash — Morton interleave rendered as base32
# ---------------------------------------------------------------------------

def geohash(lat: Column, lon: Column, precision: int = 7) -> Column:
    """Standard base32 geohash of (lat, lon) at ``precision`` chars.

    Integer construction: quantize lon to ceil(5p/2) bits and lat to
    floor(5p/2) bits of their ranges, interleave MSB-first starting with
    longitude (the geohash convention), then slice 5-bit groups into the
    base32 alphabet. All shifts/masks/substr — whole-stage codegen, and
    the oracle embeds the machine-generated identical expression."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_i = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nlon))).cast("bigint")
    lon_i = F.least(lon_i, F.lit((1 << nlon) - 1))
    lat_i = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << nlat))).cast("bigint")
    lat_i = F.least(lat_i, F.lit((1 << nlat) - 1))

    parts = []
    for m in range(nlon):  # stream bit 2m   <- lon bit (nlon-1-m)
        parts.append(F.shiftleft(
            F.shiftright(lon_i, nlon - 1 - m).bitwiseAND(F.lit(1)),
            nbits - 1 - 2 * m))
    for m in range(nlat):  # stream bit 2m+1 <- lat bit (nlat-1-m)
        parts.append(F.shiftleft(
            F.shiftright(lat_i, nlat - 1 - m).bitwiseAND(F.lit(1)),
            nbits - 2 - 2 * m))
    code = reduce(lambda a, b: a.bitwiseOR(b), parts)

    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            F.shiftright(code, nbits - 5 * (c + 1)).bitwiseAND(F.lit(31)).cast("int") + F.lit(1),
            F.lit(1),
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat: str, lon: str, precision: int = 7) -> str:
    """The identical geohash construction as SQL text (DuckDB dialect:
    >> and & bit operators, substr is 1-based — same as Spark SQL)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_i = (f"least(CAST(floor(({lon} + 180.0) / 360.0 * {float(1 << nlon)!r}) AS BIGINT), "
             f"{(1 << nlon) - 1})")
    lat_i = (f"least(CAST(floor(({lat} + 90.0) / 180.0 * {float(1 << nlat)!r}) AS BIGINT), "
             f"{(1 << nlat) - 1})")
    terms = []
    for m in range(nlon):
        terms.append(f"((({lon_i} >> {nlon - 1 - m}) & 1) << {nbits - 1 - 2 * m})")
    for m in range(nlat):
        terms.append(f"((({lat_i} >> {nlat - 1 - m}) & 1) << {nbits - 2 - 2 * m})")
    code = "(" + " | ".join(terms) + ")"
    chars = [
        f"substr('{GEOHASH_ALPHABET}', CAST((({code} >> {nbits - 5 * (c + 1)}) & 31) AS INTEGER) + 1, 1)"
        for c in range(precision)
    ]
    return "concat(" + ", ".join(chars) + ")"
