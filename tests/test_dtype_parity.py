"""Pandas-materialization parity audit for every oracled query.

The driver's correctness gate hashes PANDAS frames (round-2 evidence:
DuckDB HUGEINT materializing as float64 hash-failed against Spark's
int64 even though every value was equal). Value equality is therefore
necessary but not sufficient — the materialized dtypes must agree too.
This test pins exact dtype equality between ``df.toPandas()`` and
DuckDB's ``.df()`` for every oracled query, so a new query with a
DATE/HUGEINT/array output that would hash asymmetrically fails here
by name instead of in the driver's CORRECTNESS file.

datetime64 unit differences (ns vs us) are materialization-only and
proven hash-safe by round-2 green rows; they are the one exemption.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _pairs():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return sorted(o.keys()), q, o


@pytest.fixture(scope="module")
def duck_smoke():
    import duckdb

    from vector_db_core_spark.sources import TABLES

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", _pairs()[0])
def test_pandas_dtypes_agree(name, spark, duck_smoke):
    _, queries, oracles = _pairs()
    sp = queries[name](spark, SF_SMOKE).toPandas()
    du = duck_smoke.execute(oracles[name]).df()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column sets differ: {sorted(sp.columns)} vs {sorted(du.columns)}"
    )
    for c in sp.columns:
        s, d = str(sp[c].dtype), str(du[c].dtype)
        if s.startswith("datetime64") and d.startswith("datetime64"):
            continue  # unit (ns/us) is materialization-only, hash-safe
        assert s == d, (
            f"{name}.{c}: spark pandas dtype {s} != duckdb pandas dtype {d} — "
            "the driver hashes pandas frames, so this will hash-mismatch even "
            "with equal values; add a normalizing CAST on both sides "
            "(registry.py policy)"
        )
        if s == "object":
            # same dtype is not enough for object columns: a python
            # list cell vs a numpy array cell (or date vs Timestamp)
            # still hashes asymmetrically — pin the cell type too
            sv = sp[c].dropna()
            dv = du[c].dropna()
            if len(sv) and len(dv):
                ts_, td = type(sv.iloc[0]).__name__, type(dv.iloc[0]).__name__
                assert ts_ == td, (
                    f"{name}.{c}: object cells differ in type: spark={ts_} "
                    f"duck={td}; emit a canonical scalar (e.g. array_join "
                    "to CSV) on both sides"
                )
