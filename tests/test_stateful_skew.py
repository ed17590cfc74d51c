"""Custom stateful streaming (applyInPandasWithState), salted
aggregation equality, and SQL-API parity over registered views."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vector_db_core_spark.functions.skew import salted_counts_sums
from vector_db_core_spark.sources import load_table, register_views
from vector_db_core_spark.streaming import running_user_totals


def test_running_user_totals_replays_batch(spark, tmp_path):
    """Stateful operator over a closed multi-batch stream: each user's
    FINAL emitted totals must equal the batch aggregate."""
    events = load_table(spark, SF_ORACLE, "events").select("user_id", "value").limit(2000)
    landing = str(tmp_path / "landing")
    events.repartition(3).write.mode("overwrite").parquet(landing)

    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1)  # several micro-batches → state persists across them
        .parquet(landing)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends every per-batch emission; the final state per
    # user is the row with the highest n_events
    out = spark.table("running_totals")
    w_final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),  # totals are monotone
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in w_final.collect()}
    batch = spark.read.parquet(landing).groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("t")
    )
    want = {r.user_id: (r.n, round(r.t, 6)) for r in batch.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], u
        assert abs(got[u][1] - want[u][1]) < 1e-6, u


def test_salted_aggregation_equals_plain(spark):
    """Salting must not change results — only the shuffle layout.
    Driven on a deliberately skewed frame (one key holds ~90% of rows)."""
    base = load_table(spark, SF_ORACLE, "orders").select(
        F.when(F.col("o_orderkey") % 10 != 0, F.lit(7)).otherwise(F.col("o_custkey")).alias("k"),
        F.col("o_totalprice").alias("v"),
    )
    salted = salted_counts_sums(base, ["k"], {"v": F.col("v").cast("decimal(27,6)")}, n_salts=8)
    plain = base.groupBy("k").agg(
        F.count("*").alias("n"), F.sum(F.col("v").cast("decimal(27,6)")).alias("sum_v")
    )
    got = {r.k: (r.n, r.sum_v) for r in salted.collect()}
    want = {r.k: (r.n, r.sum_v) for r in plain.collect()}
    assert got == want
    # phase-1 really spreads the hot key: partial rows > distinct keys
    assert salted.count() == plain.count()


def test_sql_api_parity_over_views(spark):
    """register_views exposes the fixtures to spark.sql; a SQL query
    must agree with its DataFrame twin."""
    register_views(spark, SF_ORACLE)
    sql = spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders WHERE o_totalprice > 200000
        GROUP BY o_orderpriority
        """
    )
    df = (
        load_table(spark, SF_ORACLE, "orders")
        .where(F.col("o_totalprice") > 200000)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert {tuple(r) for r in sql.collect()} == {tuple(r) for r in df.collect()}
