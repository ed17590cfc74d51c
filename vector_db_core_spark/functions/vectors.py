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


def hyperplane_bucket(v: Column | str, planes: int = 8, table: int = 0) -> Column:
    """Sign-random-projection LSH bucket id in ``[0, 2^planes)``.

    Plane ``p`` of hash table ``table`` is a deterministic ±1 vector
    derived from ``xxhash64(table * 1009 + p, dim_index)`` parity — no
    stored projection matrix, every executor recomputes it from
    nothing, so the bucketing is reproducible across jobs and
    clusters. Bit ``p`` of the bucket is the sign of ``v · plane_p``.
    Cosine-similar vectors land in the same bucket with probability
    ``(1 - θ/π)^planes`` per table; multi-table search (distinct
    ``table`` values, OR'd candidates) trades candidate volume for
    recall ``1 - (1 - p^planes)^T`` — the standard LSH recall lever.
    Exact cosine re-ranks within the candidate set.
    """
    vv = _d(v)
    out = F.lit(0).cast("long")

    def _component(plane: int):
        # closure factory — a defaulted lambda arg would change the
        # lambda's arity for PySpark's higher-order-function dispatch
        return lambda x, i: x * (
            F.xxhash64(F.lit(plane), i).bitwiseAND(F.lit(1)) * 2 - 1
        ).cast("double")

    for p in range(planes):
        # ±1 component for (plane p of this table, dim i) from hash
        # parity; 1009 (prime > any sane plane count) keeps plane
        # streams of different tables disjoint, and table=0 reproduces
        # the single-table layout exactly.
        proj = F.aggregate(
            F.zip_with(
                vv,
                F.sequence(F.lit(0), F.size(vv) - 1),
                _component(table * 1009 + p),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        out = out.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def hyperplane_buckets_pandas(
    v: Column | str, planes: int = 4, tables: int = 16, seed: int = 3407
) -> Column:
    """ALL of a multi-table sign-LSH index's bucket ids in one
    Arrow-batched kernel: returns ``array<long>`` of length ``tables``
    (bucket of hash table t at position t, each in ``[0, 2^planes)``).

    This is the legitimate Pandas-UDF case the SQL-fold
    ``hyperplane_bucket`` is not: a T-table × P-plane index needs
    T*P projections per row, and T*P ``F.aggregate`` lambda folds
    (4096 interpreted element-ops per 64-dim row at 16x4) measured
    ~7x slower than ONE NumPy matmul per Arrow batch —
    ``X (batch, dim) @ planes (dim, T*P)`` runs in BLAS, then sign
    bits pack into per-table buckets with vectorized shifts. Plane
    matrix is drawn from a seeded generator at kernel-build time, so
    every executor derives the identical planes from nothing — same
    reproducibility story as the xxhash-parity planes, different
    constants (callers must not mix the two kernels in one index).
    Gaussian entries (vs ±1 parity) are the textbook sign-LSH planes;
    the collision probability ``1 - θ/π`` per plane is exactly the
    same.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _buckets(vs):
        arrs = [np.asarray(x, dtype=np.float64) for x in vs]
        if not arrs:
            return pd.Series([], dtype=object)
        X = np.stack(arrs)
        # seeded → identical planes on every executor, every batch
        rng = np.random.RandomState(seed)
        proj = rng.standard_normal((X.shape[1], tables * planes))
        bits = (X @ proj) > 0  # (batch, tables*planes)
        weights = 1 << np.arange(planes, dtype=np.int64)  # bit p → 2^p
        buckets = (
            bits.reshape(len(X), tables, planes).astype(np.int64) * weights
        ).sum(axis=2)  # (batch, tables)
        return pd.Series(list(buckets))

    return _buckets(_d(v))


def cosine_similarity_pandas(a: Column | str, b: Column | str) -> Column:
    """Cosine via a vectorized ``pandas_udf`` — the Arrow-batched
    alternative to the codegen ``cosine_similarity`` kernel.

    Exists to cover the Python-kernel escape hatch (SURVEY.md §2.2
    'pandas_udf surface'): same signature, same math, but each Arrow
    batch crosses to Python and is reduced with NumPy. Benchmarked
    slower than the JVM fold at this dimensionality — use it as the
    template for kernels Catalyst genuinely can't express (learned
    scoring, library calls), not as a default. Results match the
    codegen kernel to the last ulp only when the accumulation order
    agrees (NumPy pairwise-sums); tests assert 1e-12 agreement, and
    oracle-checked queries keep using the deterministic JVM fold.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them module-wide and PySpark's hint inference can't resolve the
    # strings; an unannotated pandas_udf defaults to SCALAR, which is
    # exactly what this is
    @pandas_udf("double")
    def _cos(xs, ys):
        out = []
        for x, y in zip(xs, ys):
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            out.append(float(xv @ yv / (np.linalg.norm(xv) * np.linalg.norm(yv))))
        return pd.Series(out)

    return _cos(_d(a), _d(b))
