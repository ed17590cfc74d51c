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
#: Round-7 rotation (mechanical). The driver never produced
#: CORRECTNESS_r06.json (no round-6 correctness run landed), so the
#: rotation basis is unchanged from round 6:
#:   covered = union of hash_match rows across CORRECTNESS_r0{1..5}.json
#:   backlog = [n for n in ORACLE if n not in covered]   # == 34
#: The 34 backlog entries — the 23 carried from the round-6 window
#: (never sampled) plus the 11 operators added in round 6 — go FIRST;
#: a green run makes distinct ever-driver-green == 188/188 for the
#: round-6 registry. The remaining 16 slots are drift sentinels,
#: chosen per the round-6 plan note: group the 154 covered queries
#: into operator families (prefix, TPC-H collapsed to one family),
#: take each family's member whose LAST green row is oldest
#: (max(round) per name), rank families by that round ascending,
#: keep 16. The cut keeps every family last-refreshed in r2/early-r3
#: (cube, distinct, join, topk, window, agg, dedup, funnel, group,
#: json, multimodal, pipeline, pivot, tpch, ref, rollup) and drops
#: the 18 freshest (scalar/set/sim/streaming/subquery/text/timeseries
#: r3-late + the r4/r5 families) — most of which the backlog itself
#: re-exercises anyway.
#: Fixture drift (the round-2 failure mode) is covered by
#: tests/test_fixture_schema.py; everything outside the window stays
#: green in the local pytest oracle replica (tests/test_oracle.py).
#:
#: ROUND-8 PLAN: recompute `covered` with CORRECTNESS_r07.json
#: included; queries oracled AFTER this rotation go first (the 21
#: round-7 additions, mechanically: [n for n in ORACLE if n not in
#: covered] — as of end-of-round-7 that is text_perplexity_buckets,
#: dedup_paragraph_keep_first, text_zipf_fit,
#: pipeline_tokenizer_fertility, pipeline_filter_funnel,
#: pipeline_nb_language_filter, streaming_cdc_upsert_replay,
#: agg_mode_frequency, window_streak_islands, join_interval_overlap,
#: join_asof_nearest, text_mattr_diversity, pipeline_shard_manifest,
#: sql_api_nation_revenue, graph_pagerank_exact,
#: sketch_count_min_md5_topk, sketch_bloom_md5_nonmembers,
#: agg_covariance_matrix, sim_pca_power_iteration_exact,
#: timeseries_holt_linear, timeseries_rolling_median — plus
#: whatever the r7 driver run leaves unsampled), then sentinels by
#: the same oldest-last-green family rule.
DRIVER_WINDOW = (
    # --- 34-query backlog: never driver-checked before this round ---
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
    # round-6 additions (added after the r6 rotation, never sampled)
    "sim_semdedup_fixed_cells",
    "streaming_minhash_dedup_instream",
    "text_top_ngram_char_fractions",
    "text_span_novelty",
    "sim_hard_negatives",
    "pipeline_dsir_weights",
    "multimodal_frame_sample",
    "agg_winsorized_stats",
    "text_quality_threshold_sweep",
    "streaming_ewma_daily_replay",
    "agg_weighted_median",
    # --- 16 drift sentinels: per family the member whose LAST green
    # --- row is oldest; families ranked by that round ascending ---
    "cube_status_priority",           # last green r2
    "distinct_market_segments",       # last green r2
    "join_broadcast_brand_volume",    # last green r2
    "topk_orders_by_price",           # last green r2
    "window_rank_dense_rank",         # last green r2
    "agg_percentile_price_quartiles", # last green r3
    "dedup_connected_clusters",       # last green r3
    "funnel_view_click_purchase",     # last green r3
    "group_topk_orders_per_customer", # last green r3
    "json_extract_props",             # last green r3
    "multimodal_binary_metadata",     # last green r3
    "pipeline_chunk_tokens",          # last green r3
    "pivot_status_by_priority",       # last green r3
    "q1_pricing_summary",             # last green r3 (TPC-H family)
    "ref_getall",                     # last green r3
    "rollup_returnflag_status",       # last green r3
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
