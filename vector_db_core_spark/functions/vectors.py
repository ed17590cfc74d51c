"""Vector math over ``array<float|double>`` columns — pure JVM-side.

[EXT] The reference stores ``Vec<u64>``-style arrays but computes
nothing over them (SURVEY.md §2.2); these are the similarity-search
kernels the north star mandates. All built from ``zip_with`` /
``aggregate`` higher-order functions: codegen'd, no Python in the hot
path, and the left-to-right fold order is deterministic (unlike a
shuffle-order-dependent float SUM).

Elements are cast to DOUBLE before arithmetic so float32 inputs widen
exactly and both engines (Spark, DuckDB oracle) see identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-fold aggregate (deterministic order)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
