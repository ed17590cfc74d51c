from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import pytest

# Pin the process timezone to UTC before Spark or DuckDB start:
# PySpark collect() materializes timestamps in the OS-local zone while
# DuckDB returns UTC-naive values, so comparisons are only meaningful
# when the host zone is UTC — make that explicit instead of assumed.
os.environ["TZ"] = "UTC"
time.tzset()

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from vector_db_core_spark.session import get_spark

    s = get_spark(app_name="vector_db_core_spark_tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    from vector_db_core_spark.sources import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()
