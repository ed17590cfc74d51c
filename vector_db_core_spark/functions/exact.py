"""Order-independent exact aggregation helpers.

Floating-point SUM/AVG results depend on accumulation order, which
differs run-to-run under AQE and engine-to-engine versus the DuckDB
oracle. Every monetary/quantity column in the fixtures carries at most
2 decimal digits, so summing in DECIMAL is *exact* and therefore
order-independent; casting the final decimal back to DOUBLE gives a
bit-identical float in any engine. AVG is computed as exact-sum /
count — one IEEE division of identical inputs is itself identical.

This costs one decimal aggregation instead of a double aggregation —
still whole-stage-codegen'd JVM arithmetic, no UDFs — and buys
deterministic results at any parallelism, which matters as much on a
1000-executor cluster as it does against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough integer headroom for 100-TB-scale sums of 2-dp values
DEC = "decimal(27,6)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact decimal sum, surfaced as DOUBLE."""
    out = F.sum(dec(col)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent average: exact decimal sum / count, in DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(dec(c)).cast("double") / F.count(c).cast("double")
    return out.alias(alias) if alias else out
