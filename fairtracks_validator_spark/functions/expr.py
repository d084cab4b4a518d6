"""Expression-level helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(bound_expr: Column, body) -> Column:
    """Poor-man's let-binding for Column expressions: ``let_(e, f) ≡ f(e)``
    but ``e`` is evaluated ONCE per row.

    Catalyst's CollapseProject inlines a projected column into every use
    site and interpreted higher-order functions have no common-subexpression
    elimination, so an expensive expression referenced k times (a MinHash
    signature used by 4 band keys, a token array scored by 4 stopword
    profiles) is otherwise recomputed k times. Wrapping it as the input of a
    single-element ``transform`` forces one evaluation; the lambda variable
    is a cheap bound reference. Works for any data type, including structs.
    """
    return F.element_at(F.transform(F.array(bound_expr), body), 1)


def null_safe_group_key(col: Column) -> Column:
    """Grouping/rejoin surrogate that keeps NULL as a real stratum.

    Equi-joins drop NULL keys (null != null), so operators that aggregate
    per group and join the result back would silently lose every NULL-group
    row. Coalescing onto a sentinel that no cast-to-string value can equal
    (a leading NUL byte) keeps the stratum intact; the original column
    passes through untouched for output.
    """
    return F.coalesce(col.cast("string"), F.lit("\x00null"))
