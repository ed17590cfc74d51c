"""FAST_ORACLES (tools/oracle_sweep.py) must be row-for-row identical
to the REGISTERED oracle SQL they substitute for — pinned here at
sf0.01 where the quadratic/recursive registered formulations are still
affordable. If this holds, the sweep's fast path at sf0.1+ checks the
same semantics the driver's hard gate checks at sf0.01.

No Spark involved: this compares two DuckDB/numpy formulations of the
ORACLE side only (the Spark side is compared against either one by the
sweep itself).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.oracle_sweep import FAST_ORACLES, TABLES, norm  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(FAST_ORACLES))
def test_fast_oracle_matches_registered_sql(con, name):
    from vector_db_core_spark.operators import ORACLE

    rel = con.sql(ORACLE[name])
    want = norm(rel.fetchall(), [c[0] for c in rel.description])
    rows, cols = FAST_ORACLES[name](con)
    got = norm(rows, cols)
    assert got == want
    assert len(got) > 0, "vacuous equivalence — fixture produced no rows"
