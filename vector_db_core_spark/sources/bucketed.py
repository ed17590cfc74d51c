"""Bucketed tables — shuffle-free co-located joins.

The 100 TB join strategy the loaders can't give you: two fact tables
bucketed by the SAME key into the SAME bucket count are join-ready
on disk — Spark's scan reports the bucketing as its output
partitioning, so the SortMergeJoin needs NO Exchange on either side.
For a fact-fact join that runs repeatedly (orders ⋈ lineitem every
night), paying one bucketed write amortizes the per-run shuffle away
— the biggest single cost in a repeated big join.

This is the Spark-native analog of the reference's "layout decided at
write time" philosophy (fixed-slot files, ordinal addressing —
static_vector_manage_service.rs): organize bytes once, so every read
gets its access pattern for free.

Bucketing requires the table catalog (bucket metadata lives there,
not in parquet footers), so these helpers go through
``saveAsTable``/``table`` with an explicit ``path`` — the default
in-memory catalog works; no Hive metastore needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Write ``df`` bucketed (and sorted within buckets) by ``key``.

    Sorting within buckets additionally lets the sort-merge join skip
    its per-partition sort — the scan is already in join-key order.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket metadata attached (a plain
    ``spark.read.parquet`` of the same files would LOSE the bucketing
    and re-shuffle on join)."""
    return spark.table(table)
