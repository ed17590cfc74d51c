"""vector_db_core_spark — a PySpark-native analytics engine.

A brand-new engine reproducing the *capabilities* of the reference
record store ``tianzeshi-study/vector-db-core`` (an embedded,
append-only, ordinal-indexed record store — see SURVEY.md) on top of
Apache Spark, and extending it with the full relational +
LLM-data-pipeline operator surface (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Design pillars (SURVEY.md §7):
  * DataFrame/SQL first — Catalyst plans everything; no hand scheduling.
  * The reference's one nonstandard semantic — dense 0-based insertion
    ordinals (``rowid``) — is materialized at ingest with a
    shuffle-free protocol (see ``store.py``).
  * UDFs only where built-ins can't express the semantics, and then
    always Arrow-vectorized (pandas_udf / mapInPandas).
"""

from vector_db_core_spark.session import get_spark
from vector_db_core_spark.store import OrdinalStore

__all__ = ["get_spark", "OrdinalStore"]
__version__ = "0.1.0"
