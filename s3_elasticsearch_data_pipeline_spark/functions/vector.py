"""Vector math over array columns — pure built-in expressions.

``zip_with`` + ``aggregate`` fold sequentially over the array, so the
floating-point result is deterministic and reproducible across engines
(the DuckDB oracle's ``list_inner_product`` folds in the same order).
Everything is computed in double: float arrays are cast up front —
float×float accumulation would diverge from the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe zero-norm guard."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None)).otherwise(d / (na * nb))
