"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all
cores); the same configs are the ones we would ship on a 1000-executor
cluster — AQE on (runtime re-planning, skew-join splitting, partition
coalescing), UTC session time (oracle comparability), Arrow transfer
for the few pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vector_db_core_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``spark.sql.shuffle.partitions`` defaults to the local core count —
    on a real cluster this would be ~2-3x total executor cores, and AQE
    coalesces the excess at runtime anyway.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r15: keep persisted plans' output partitioning VISIBLE to
        # consumers (Spark 3.4+ defaults this to true, wrapping cached
        # subtrees in AdaptiveSparkPlan and hiding their partitioning,
        # so every join against a deliberately repartition(k, key)'d
        # cache re-exchanged BOTH sides — measured in the executed
        # triangle/pagerank plans). This engine's caches are
        # explicitly partitioned loop state (edges on src, labels on
        # node, oriented edges on src): consumers must be able to
        # reuse that partitioning. Quiet-host alternating A/B:
        # pagerank med 9.47 -> 7.81 s, connected components med
        # 5.27 -> 4.02 s, triangles flat. The cost — no AQE
        # coalescing inside cached builds — is deliberate: the builds
        # pin their own widths.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
        # r15: let the planner pick shuffled-hash join when its size
        # conditions are met (guide §3.1/§9) instead of always
        # preferring sort-merge. The iterative loops join a large
        # cached edge table against a small per-iteration state frame:
        # SMJ re-SORTS the 2|E| cached edge rows every iteration, SHJ
        # builds the hash on the small state side and streams the
        # edges unsorted. Quiet-host alternating A/B (two windows):
        # pagerank med 9.14 -> 7.57 s / min 10.27 -> 6.65, CC and
        # kcore flat-to-better, nothing worse. Cluster-safe: the
        # planner only chooses SHJ when a build side fits its
        # per-partition threshold, and falls back to SMJ otherwise —
        # a size-gated preference, not a forced hint.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
