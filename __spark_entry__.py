"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001).
``queries()`` — every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — matching DuckDB SQL for the hash-match gate.

Implementation lives in ``vector_db_core_spark/``; this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's two core reads in one plan — ordinal range scan
    (`pullx`, dynamic_vector_manage_service.rs:332-359) + count (`len`,
    :72-79) — generalized to a grouped aggregate over the events log:
    pushed-down rowid range predicate, exact-decimal sums.
    """
    from pyspark.sql import functions as F

    from vector_db_core_spark.functions.exact import dsum
    from vector_db_core_spark.sources import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return (
        # event_id is used as the ordinal surrogate DELIBERATELY: on
        # this fixture it is the dense 0-based insertion ordinal, so it
        # stands in for the store's `rowid` contract column without
        # building a store in the smoke path. Don't "fix" it to rowid —
        # the raw fixture has no rowid column.
        events.where(F.col("event_id").between(0, 799))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vector_db_core_spark.operators import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vector_db_core_spark.operators import ORACLE

    return dict(ORACLE)
