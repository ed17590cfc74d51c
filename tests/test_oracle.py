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
    "agg_higher_moments",        # exact integer power sums
    "pipeline_curriculum_phases",  # exact global percentile thresholds
    "q9_product_type_profit",    # two decimal sums subtracted in double
    "agg_incremental_merge",     # base+delta mergeable-state algebra
    "checksum_orders_table",     # DECIMAL(38,0) hash-fold accumulation
    "agg_mad_robust_outliers",   # exact-percentile-derived robust stats
    "text_char_entropy",         # decimal-absorbed log2 term sums
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
    the curated round-4 window IS the iteration-order prefix, that it
    still spans every operator family, and that every slot is both
    oracled and NEW to the hard gate (never green in rounds 1-3) — the
    rotation that lifts cross-round driver coverage to 99 of 112
    oracled queries, the max a 50-slot window allows."""
    from vector_db_core_spark.operators import DRIVER_WINDOW, ORACLE, QUERIES

    assert len(DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == list(DRIVER_WINDOW)
    # oracle iteration order must agree (driver zips them independently)
    oracled_prefix = [n for n in QUERIES if n in ORACLE][:10]
    assert oracled_prefix == [n for n in ORACLE][:10]
    families = ("join_", "window_", "agg_", "scalar_", "q6", "subquery",
                "set_", "grouping", "pivot", "timeseries_", "cohort",
                "profile", "assoc", "dedup_", "text_", "sim_",
                "pipeline_", "streaming_")
    for fam in families:
        assert any(n.startswith(fam) or fam in n for n in DRIVER_WINDOW), fam
    # every round-4 slot must be oracled (no rows-only entries burning
    # a hash-check slot — the round-3 sim_ann_lsh_topk lesson)
    assert all(n in ORACLE for n in DRIVER_WINDOW)
    # and none may repeat a query the driver already hash-checked green
    # in round 3 (the union across rounds is the point of the rotation)
    import json
    import os

    r3_path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r03.json")
    with open(r3_path) as fh:
        r3 = json.load(fh)
    already_green = {k for k, v in r3.items() if v.get("hash_match")}
    repeats = [n for n in DRIVER_WINDOW if n in already_green]
    assert not repeats, repeats
