"""Query registry — the driver-facing contract.

Every operator family from SURVEY.md §2 registers one or more named queries
here. A query is a ``(spark, sf_dir) -> DataFrame`` callable plus (usually) a
DuckDB-compatible ANSI-SQL oracle string that must produce the identical
result set (same column names, same types, same values) over the same parquet
tables. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry.

Determinism rules every registered query follows (so an order-insensitive
value-hash comparison passes):

- alias every computed column identically in DataFrame code and oracle SQL;
- aggregate money-like doubles via DECIMAL (functions.numeric) — exact and
  partition-order-independent, which also means cluster-size-independent;
- any LIMIT is preceded by a total-order ``ORDER BY`` (unique tie-break key);
- anything hash-dependent uses the portable md5-based hash64
  (functions.hashing) so the oracle can reproduce it bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    tags: tuple[str, ...]
    bench: bool  # part of the bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items() if s.bench}


_SCRATCH_ROOTS: list[str] = []


def _reap_scratch() -> None:
    import shutil

    for root in _SCRATCH_ROOTS:
        shutil.rmtree(root, ignore_errors=True)
    _SCRATCH_ROOTS.clear()


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is reaped at interpreter exit.

    Registry rows that exercise stateful compositions (VersionedTable
    ingest, persisted indexes, checkpointed streams) need a working
    directory that outlives the function call — the returned DataFrame is
    lazy and still reads these files when the caller materializes it — so
    per-call ``rmtree`` is wrong. Per-process ``atexit`` cleanup is the
    correct lifetime: a bench/sweep run no longer leaks one table+index
    tree per invocation (ADVICE r10)."""
    import atexit
    import tempfile

    root = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH_ROOTS:
        atexit.register(_reap_scratch)
    _SCRATCH_ROOTS.append(root)
    return root
