"""Operator catalog. Importing this package registers every query.

Modules register into ``registry.QUERIES`` / ``registry.ORACLE``;
``__spark_entry__`` exposes them to the driver.

The driver's correctness gate checks the FIRST 50 registry entries in
iteration order, so ``DRIVER_WINDOW`` curates that window to span every
operator family (reference surface, relational core, one per extra
family, LLM-pipeline, data-pipeline) instead of whatever import order
happens to produce. Everything outside the window stays registered and
is oracle-checked by the local pytest replica (tests/test_oracle.py).
"""

from vector_db_core_spark.operators import reference  # noqa: F401
from vector_db_core_spark.operators import relational  # noqa: F401
from vector_db_core_spark.operators import llm  # noqa: F401
from vector_db_core_spark.operators import extra  # noqa: F401
from vector_db_core_spark.operators import pipeline  # noqa: F401
from vector_db_core_spark.operators import streaming_queries  # noqa: F401
from vector_db_core_spark.operators import analytics  # noqa: F401
from vector_db_core_spark.operators import warehouse  # noqa: F401

from vector_db_core_spark.operators.registry import ORACLE, QUERIES

#: The 50 queries surfaced to the driver's correctness window.
#:
#: Round-6 rotation (mechanical, per the r5 verdict):
#:   covered = union of hash_match rows across CORRECTNESS_r0{1..5}.json
#:   backlog = [n for n in ORACLE if n not in covered]   # == 23
#: The 23 backlog entries (12 deferred from the r5 window + the 11
#: operators added in round 5) go FIRST; a green run makes distinct
#: ever-driver-green == 177/177, i.e. every oracled query in the
#: registry has at least one driver hash row. The remaining 27 slots
#: are drift sentinels: group the 154 covered queries into operator
#: families (prefix, TPC-H collapsed to one family), take each
#: family's OLDEST-green member, rank families by that round
#: ascending, keep 27. The seven families dropped by the cut
#: (profile, unpivot, attribution, checksum, merge, quality, scd2)
#: are exactly the freshest — all first green in r4/r5.
#: Fixture drift (the round-2 failure mode) is covered by
#: tests/test_fixture_schema.py; everything outside the window stays
#: green in the local pytest oracle replica (tests/test_oracle.py).
#:
#: ROUND-7 PLAN: recompute `covered` with CORRECTNESS_r06.json
#: included; queries oracled AFTER this rotation go first (so far:
#:   sim_semdedup_fixed_cells, streaming_minhash_dedup_instream,
#:   text_top_ngram_char_fractions, text_span_novelty,
#:   sim_hard_negatives, pipeline_dsir_weights,
#:   multimodal_frame_sample, agg_winsorized_stats,
#:   text_quality_threshold_sweep, streaming_ewma_daily_replay,
#:   agg_weighted_median),
#: then sentinels — per family take the member whose LAST green row
#: is oldest (use max(round) per name, not min) so rotation pressure
#: spreads across rounds.
DRIVER_WINDOW = (
    # --- 23-query backlog: never driver-checked before this round ---
    # text analysis tail (r5 additions + r5-deferred)
    "text_vocabulary_topn",
    "text_boilerplate_phrases",
    "text_char_entropy",
    "text_hashing_vectorizer",
    "text_split_segments",
    "text_split_segments_udtf",
    "text_bigram_fluency",
    "text_gopher_quality_flags",
    "text_top_bigram_char_fraction",
    # windows / scalars / aggregates deferred from r5
    "window_ntile_percentile_ranks",
    "window_tumbling_event_counts",
    "scalar_edit_distance",
    "scalar_conditional_functions",
    "agg_collect_sorted_sets",
    "agg_boolean_filtered",
    "agg_equidepth_histogram",
    # similarity / multimodal (r5 additions)
    "sim_knn_label_vote",
    "multimodal_resize_thumbnail",
    # data-pipeline (r5 additions + deferred)
    "pipeline_pps_sample",
    "pipeline_cluster_safe_folds",
    "pipeline_mixture_token_budget",
    "pipeline_url_normalize_dedup",
    # streaming (r5 addition)
    "streaming_minhash_dedup_replay",
    # --- 27 drift sentinels: one per family, oldest green first ---
    "agg_stats_lineitem",             # r1
    "case_bucketize_orders",          # r1
    "cube_status_priority",           # r1
    "distinct_market_segments",       # r1
    "group_topk_orders_per_customer", # r1
    "join_anti_customers_without_orders",  # r1
    "json_extract_props",             # r1
    "ref_getall",                     # r1
    "rollup_returnflag_status",       # r1
    "scalar_date_functions",          # r1
    "set_except_inactive_custkeys",   # r1
    "topk_orders_by_price",           # r1
    "q1_pricing_summary",             # r1 (TPC-H family)
    "window_lag_lead_delta",          # r1
    "dedup_canonical_documents",      # r2
    "sim_cosine_topk",                # r2
    "text_fingerprint",               # r2
    "funnel_view_click_purchase",     # r3
    "multimodal_binary_metadata",     # r3
    "pipeline_chunk_tokens",          # r3
    "pivot_status_by_priority",       # r3
    "streaming_interval_join_replay", # r3
    "subquery_exists_priority_counts",  # r3
    "timeseries_ewma_daily_value",    # r3
    "assoc_part_pairs_in_orders",     # r4
    "cohort_daily_retention",         # r4
    "grouping_sets_status_priority",  # r4
)


def _apply_driver_window() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names unknown queries: {missing}")
    windowed = set(DRIVER_WINDOW)
    order = list(DRIVER_WINDOW) + [n for n in QUERIES if n not in windowed]
    for d in (QUERIES, ORACLE):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)


_apply_driver_window()

__all__ = ["QUERIES", "ORACLE", "DRIVER_WINDOW"]
