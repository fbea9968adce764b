"""Portable deterministic 64-bit hashing.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different algorithms,
so any operator whose *output* depends on hash values (MinHash signatures,
SimHash bits, LSH band ids, fingerprints) could never be checked against a
SQL oracle with engine-native hashes. Instead we derive a 60-bit integer from
MD5 — available and bit-identical in both engines:

    hash64(s) = int(hex(md5(s))[0:15], 16)          # 15 hex digits = 60 bits

Spark:  ``cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)``
DuckDB: ``cast(concat('0x', substr(md5(s), 1, 15)) as bigint)``

MD5 is cryptographic — overkill strength-wise, but it's the only 64-bit-class
hash both engines (and any future oracle) share, it stays entirely inside
JVM codegen on the Spark side (no Python), and 60 bits is plenty for minhash
/ banding at 100 TB-scale cardinalities (collision rate ~n²/2⁶⁰).

Seeded family: ``hash64(s, seed)`` hashes ``s || '#' || seed`` — independent
enough for k MinHash permutations.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: printf-style fragments for embedding the same hash in SQL text.
HASH64_SPARK_FMT = "cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
HASH64_DUCK_FMT = "cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


def hash64(col: Column | str, seed: int | None = None) -> Column:
    """60-bit portable hash of a string column (optionally seeded)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(c, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str, dialect: str = "duckdb", seed: int | None = None) -> str:
    """The same hash as a SQL string for the given dialect."""
    if seed is not None:
        expr = f"concat({expr}, '#{seed}')"
    fmt = HASH64_DUCK_FMT if dialect == "duckdb" else HASH64_SPARK_FMT
    return fmt.format(expr=expr)


# ---- MinHash permutation family -------------------------------------------
# k independent hash functions as affine rehashes of ONE base hash:
#     h_i(s) = (a_i · (hash64(s) mod P) + b_i) mod P,   P = 2³¹ − 1
# One md5 per shingle instead of k — the md5 is the expensive part (k× fewer
# digest evaluations turned a 191 s sf0.1 signature stage into seconds).
# 31-bit values keep a_i·h < 2⁶² (no bigint overflow under ANSI mode) and the
# arithmetic is bit-identical in any engine. Coefficients are fixed (seeded
# PRNG) and embedded as literals in both Spark expressions and oracle SQL.
MINHASH_P = 2_147_483_647

def minhash_coeffs(k: int, seed: int = 42) -> tuple[list[int], list[int]]:
    import random

    rng = random.Random(seed)
    a = [rng.randrange(1, MINHASH_P) for _ in range(k)]
    b = [rng.randrange(0, MINHASH_P) for _ in range(k)]
    return a, b
