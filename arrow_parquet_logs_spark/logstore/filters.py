"""``(col, op, val)`` filter-triple compiler → Catalyst ``Column``.

The reference's entire "logical plan" is a list of comparison triples that it
compiles twice — once into pyarrow dataset expressions for parquet pushdown
(reference reader.py:29-59) and once into pyarrow.compute masks for in-memory
buffers (reference reader.py:61-86). On Spark one compilation suffices:
Catalyst decides pushdown-vs-post-scan per source, and the same predicate
prunes partitions, skips row groups, and filters residual rows.

Deliberate semantic fix (SURVEY.md §1.3): the reference *silently skips*
unknown operators (reference reader.py:54-56, reader.py:82-83) — a filter
you mistyped simply doesn't filter. We raise ``FilterError`` instead.

Null semantics: conjunction is Kleene-AND, matching both the reference's
``pc.and_kleene`` (reference reader.py:85) and SQL.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import reduce
from typing import Any

from pyspark.sql import Column, functions as F


class FilterError(ValueError):
    """Unknown operator or malformed filter triple."""


_OPS = {
    ">=": Column.__ge__,
    "<=": Column.__le__,
    "==": Column.__eq__,
    "=": Column.__eq__,
    "!=": Column.__ne__,
    ">": Column.__gt__,
    "<": Column.__lt__,
    "in": lambda c, v: c.isin(list(v)),
    "not in": lambda c, v: ~c.isin(list(v)),
    "is null": lambda c, _: c.isNull(),
    "is not null": lambda c, _: c.isNotNull(),
    "like": lambda c, v: c.like(v),
    "rlike": lambda c, v: c.rlike(v),
}


def compile_filter(triple: Sequence[Any]) -> Column:
    if len(triple) == 2:
        col, op, val = triple[0], triple[1], None
    elif len(triple) == 3:
        col, op, val = triple
    else:
        raise FilterError(f"filter must be (col, op[, val]), got {triple!r}")
    if not isinstance(col, str) or not isinstance(op, str):
        raise FilterError(f"col and op must be strings, got {triple!r}")
    fn = _OPS.get(op)
    if fn is None:
        raise FilterError(f"unknown filter operator {op!r} (supported: {sorted(_OPS)})")
    return fn(F.col(col), val)


def compile_filters(triples: Iterable[Sequence[Any]]) -> Column:
    """AND-fold triples into one predicate; empty input → literal true."""
    cols = [compile_filter(t) for t in triples]
    if not cols:
        return F.lit(True)
    return reduce(lambda a, b: a & b, cols)
