"""Operator catalog. Importing this package registers every query.

Modules register into ``registry.QUERIES`` / ``registry.ORACLE``;
``__spark_entry__`` exposes them to the driver.
"""

from vector_db_core_spark.operators import reference  # noqa: F401
from vector_db_core_spark.operators import relational  # noqa: F401
from vector_db_core_spark.operators import llm  # noqa: F401
from vector_db_core_spark.operators import extra  # noqa: F401
from vector_db_core_spark.operators import pipeline  # noqa: F401

from vector_db_core_spark.operators.registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
