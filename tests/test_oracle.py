"""The local replica of the driver's t2 gate: every registered query
with an oracle must match DuckDB on the sf0.01 tables exactly
(names + row count + order-insensitive values)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_util import compare_spark_duck


def _pairs():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return sorted(o.keys()), q, o


def test_every_oracle_has_query():
    names, q, o = _pairs()
    missing = [n for n in names if n not in q]
    assert not missing, f"oracle_sql entries without queries(): {missing}"


@pytest.mark.parametrize("name", _pairs()[0])
def test_oracle_match(name, spark, duck):
    _, queries, oracles = _pairs()
    df = queries[name](spark, SF_ORACLE)
    rel = duck.sql(oracles[name])
    problems = compare_spark_duck(df, rel)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", [
    "q1_pricing_summary",        # exact-decimal sums
    "agg_stddev_variance",       # decimal moments
    "sim_label_centroids",       # decimal vector means
    "text_unigram_logprob",      # decimal-cast ln sums
])
def test_results_partition_independent(name, spark):
    """The exact-arithmetic policy's real claim: identical results at
    ANY parallelism. Run each decimal-accumulation query at 3 and 32
    shuffle partitions and require bit-identical rows."""
    q = _pairs()[1]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(str, q[name](spark, SF_ORACLE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(str, q[name](spark, SF_ORACLE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_driver_window_is_first_50_and_spans_families():
    """The driver hash-checks the first 50 registry entries; pin that
    the curated window IS the iteration-order prefix and that every
    family keyword appears in it."""
    from vector_db_core_spark.operators import DRIVER_WINDOW, ORACLE, QUERIES

    assert len(DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == list(DRIVER_WINDOW)
    # oracle iteration order must agree (driver zips them independently)
    oracled_prefix = [n for n in QUERIES if n in ORACLE][:10]
    assert oracled_prefix == [n for n in ORACLE][:10]
    families = ("ref_", "q1", "join_", "window_", "agg_", "scalar_",
                "dedup_", "text_", "sim_", "multimodal_", "pipeline_",
                "funnel", "timeseries_", "pivot", "subquery", "streaming_")
    for fam in families:
        assert any(n.startswith(fam) or fam in n for n in DRIVER_WINDOW), fam
    # at most 3 rows-only entries in the window (rest must be oracled)
    assert sum(1 for n in DRIVER_WINDOW if n not in ORACLE) <= 3
