"""Differential-compare helper mimicking the driver's correctness gate:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def normalize(rows, columns):
    """→ sorted list of tuples, columns sorted by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in columns), out


def compare_spark_duck(spark_df, duck_rel) -> list[str]:
    """Run both, return a list of mismatch descriptions (empty = match)."""
    problems = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d_rows = [tuple(r) for r in duck_rel.fetchall()]
    d_cols = [d[0] for d in duck_rel.description]

    sc, sv = normalize(s_rows, s_cols)
    dc, dv = normalize(d_rows, d_cols)
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duck={dc}")
        return problems
    if len(sv) != len(dv):
        problems.append(f"row count differs: spark={len(sv)} duck={len(dv)}")
    if sv != dv:
        diffs = [(a, b) for a, b in zip(sv, dv) if a != b][:5]
        extra_s = [r for r in sv if r not in set(dv)][:3]
        extra_d = [r for r in dv if r not in set(sv)][:3]
        problems.append(
            f"values differ; first row-aligned diffs={diffs} spark-only={extra_s} duck-only={extra_d}"
        )
    return problems
