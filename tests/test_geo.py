"""Geospatial operator guarantees (operators/geo.py).

- geohash bit-interleave pinned against an independent textbook
  implementation (bisection loop, written here from the public spec);
- radius_join == brute-force ground truth, including pairs that straddle
  the antimeridian (the wrap-grid guarantee);
- knn_join determinism under hostile repartitioning.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from arrow_parquet_logs_spark.operators.geo import (
    EARTH_RADIUS_KM,
    GEOHASH_ALPHABET,
    geohash,
    haversine_km,
    knn_join,
    radius_join,
)


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook geohash: interval bisection, lon bit first (public spec)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    bit_count, ch = 0, 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        bit_count += 1
        if bit_count == 5:
            out.append(GEOHASH_ALPHABET[ch])
            bit_count, ch = 0, 0
    return "".join(out)


def _ref_haversine(lat1, lon1, lat2, lon2) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1) / 2
    dlam = math.radians(lon2 - lon1) / 2
    a = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlam) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def _points(n: int, seed: int, lat_band: float = 60.0):
    """Deterministic pseudo-random points in the ±lat_band band."""
    import random

    rng = random.Random(seed)
    return [
        (i, round(rng.uniform(-lat_band, lat_band), 5),
         round(rng.uniform(-180.0, 180.0), 5))
        for i in range(n)
    ]


def test_geohash_matches_textbook(spark):
    # the classic worked example from the public spec...
    pts = [(0, 57.64911, 10.40744)] + _points(200, seed=7, lat_band=89.0)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    for precision in (1, 5, 7, 9):
        got = {
            r["id"]: r["gh"]
            for r in df.select(
                "id", geohash(F.col("lat"), F.col("lon"), precision).alias("gh")
            ).collect()
        }
        want = {i: _ref_geohash(la, lo, precision) for i, la, lo in pts}
        assert got == want
    assert _ref_geohash(57.64911, 10.40744, 7) == "u4pruyd"  # spec example


def test_radius_join_equals_bruteforce_including_antimeridian(spark):
    # cluster points near the ±180 seam so wrap pairs definitely exist
    base = _points(150, seed=11)
    seam = [
        (1000 + i, lat, 179.0 + 2.0 * frac - (360.0 if 179.0 + 2.0 * frac > 180.0 else 0.0))
        for i, (_, lat, frac01) in enumerate(_points(50, seed=13))
        for frac in [abs(frac01) / 180.0]
    ]
    pts = base + seam
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    radius = 800.0

    got = {
        (r["l_id"], r["r_id"])
        for r in radius_join(
            df.select(F.col("id").alias("l_id"), "lat", "lon"),
            df.select(F.col("id").alias("r_id"), "lat", "lon"),
            radius,
        ).select("l_id", "r_id").collect()
    }
    want = {
        (a[0], b[0])
        for a in pts for b in pts
        if _ref_haversine(a[1], a[2], b[1], b[2]) <= radius
    }
    assert got == want
    # the seam actually exercised wrap: at least one pair crosses ±180
    assert any(
        abs(
            next(p for p in pts if p[0] == l)[2]
            - next(p for p in pts if p[0] == r)[2]
        ) > 180.0
        for l, r in got
    )


def test_haversine_matches_math(spark):
    pts = _points(50, seed=3)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    rows = (
        df.alias("a").crossJoin(df.alias("b"))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("i"), F.col("b.id").alias("j"),
            haversine_km(F.col("a.lat"), F.col("a.lon"),
                         F.col("b.lat"), F.col("b.lon")).alias("d"),
            F.col("a.lat").alias("la1"), F.col("a.lon").alias("lo1"),
            F.col("b.lat").alias("la2"), F.col("b.lon").alias("lo2"),
        )
        .collect()
    )
    for r in rows:
        assert r["d"] == pytest.approx(
            _ref_haversine(r["la1"], r["lo1"], r["la2"], r["lo2"]), abs=1e-9
        )


def test_knn_join_deterministic_under_repartitioning(spark):
    pts = _points(300, seed=21)
    left = spark.createDataFrame(pts[:80], "lid long, lat double, lon double")
    right = spark.createDataFrame(pts[80:], "rid long, lat double, lon double")

    def run(l, r):
        return sorted(
            (x["lid"], x["nn_rank"], x["rid"], x["dist_mm"])
            for x in knn_join(l, r, 3, 3000.0, "lid", "rid").collect()
        )

    a = run(left, right)
    b = run(left.repartition(13, "lat"), right.repartition(7, "lon"))
    assert a == b and len(a) > 0
    # rank really is per-left: no left id exceeds k, ranks are 1..m contiguous
    from collections import defaultdict

    by_left = defaultdict(list)
    for lid, rank, _, _ in a:
        by_left[lid].append(rank)
    for ranks in by_left.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
