"""Query registry: the single source of truth behind ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers itself with the :func:`query`
decorator, pairing the PySpark implementation with its DuckDB oracle SQL
(or ``oracle=None`` for rows-only checks such as approximate operators).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_PRIORITY: dict[str, tuple[int, int]] = {}

# Modules that register queries at import time.
#
# ORDER MATTERS for the round driver: CORRECTNESS_r{N}.json keeps roughly the
# first 50 registered queries (observed cap in round 1 — the file stopped
# mid-bundle at q_fn_regex in registration order). Register the highest-risk,
# most novel operators first (LLM dedup/similarity/pipeline, UDFs, streaming
# twins, kinesis envelope) so they land inside the checked window; the
# long-stable relational operators rotate to the back. tests/test_oracle.py
# remains the full 98-query mirror regardless of this order.
_MODULES = (
    "operators.canaries",
    "llm.dedup",
    "llm.pipeline",
    "llm.curation",
    "llm.splits",
    "llm.vectors",
    "llm.ordering",
    "llm.ingest",
    "llm.scoring",
    "llm.spans",
    "llm.audits",
    "llm.sketches",
    "llm.training",
    "operators.events",
    "operators.timeseries",
    "operators.governance",
    "operators.analytics",
    "operators.geo",
    "llm.similarity",
    "llm.retrieval",
    "functions.udfs",
    "streaming.windows",
    "sources.kinesis_queries",
    "llm.text",
    "llm.multimodal",
    "functions.nested",
    "functions.strings",
    "functions.datetime_math",
    "operators.scans",
    "operators.filters",
    "operators.joins",
    "operators.aggregates",
    "operators.windows",
    "operators.sorts_sets",
)

# ROUND-14 ROTATION (computed from CORRECTNESS_r01..r13.json): the cumulative
# ledger is fully green through round 13 — for the first time EVERY
# registered query has a driver-confirmed row at its declared oracle level
# (416 hash-green + 2 by-design rows-only). Round-14 window, in priority
# order:
#
#   override 8   the 8 round-14 additions (A20 cost plan, A21 KPL plan,
#                C177 RIFF header, C178 PDF header, C179 MP4 mvhd walk,
#                B213 MACD, B214 ATR, B215 stochastic) staged DIRECTLY
#                into their own round's window — the zero-lag staging
#                rule made permanent (VERDICT r13 item #2) — slots 0..7
#   override 9   the re-verify tranche — q_ts_stl_decompose's
#                trend window gained the dense-calendar gate
#                (max(d)-min(d) = 6 beside nw = 7, ADVICE r13), a
#                semantics change on sparse series, so its r13 row is
#                stale by construction
#   override 10  canary 3-round refresh: the 5 canaries last sampled in
#                r11 (q_canary_array_semantics, r12, waits for r15)
#   override 12  freshness rotation — the remaining slots to 49:
#                q_win_time_range (the last r3-era row) then the r4-era
#                cohort (registration order within the tranche), draining
#                VERDICT r13 item #1 to within the four names the
#                mid-round additions displaced (one per addition; they
#                HEAD the r15 freshness queue — see tranche (e))
#   override 100 every other ever-driver-sampled query
#
# Rows-only half-frequency rule (VERDICT r11 item #2) still holds: the two
# remaining no_oracle queries (q_agg_approx_distinct,
# q_agg_percentile_approx) have >=2 clean runs and pin at 100.
# tests/test_registry_rotation.py recomputes and asserts this composition.
_PRIORITY_OVERRIDES: dict[str, int] = {
    # (a) the round-14 additions, staged into the window (zero-lag rule):
    #     slots 0..N-1. Each mid-round addition displaces ONE freshness
    #     name from tranche (d) to the head of the r15 queue (the window
    #     is exactly 50 slots) — the deferred names are listed in (e).
    **{
        n: 8
        for n in (
            "q_kinesis_cost_plan",
            "q_kinesis_kpl_plan",
            "q_llm_media_dims_mp4",
            "q_llm_media_dims_pdf",
            "q_llm_media_dims_riff",
            "q_ts_atr",
            "q_ts_macd",
            "q_ts_stochastic",
        )
    },
    # (b) re-verify tranche (STL dense-calendar gate): slot 4
    **{
        n: 9
        for n in (
            "q_ts_stl_decompose",
        )
    },
    # (c) canary 3-round refresh (r11 cohort): slots 5..9
    **{
        n: 10
        for n in (
            "q_canary_add_months",
            "q_canary_ln_quant",
            "q_canary_regex_subset",
            "q_canary_tok_split",
            "q_canary_wideint_convert",
        )
    },
    # (d) freshness rotation (r3 remainder + the full r4 cohort):
    #     slots 10..49
    **{
        n: 12
        for n in (
            "q_win_time_range",
            "q_basket_pairs",
            "q_events_cohort_retention",
            "q_events_sessionize",
            "q_llm_bitext_mine",
            "q_llm_bpe_pairs",
            "q_llm_bpe_train3",
            "q_llm_composition",
            "q_llm_corpus_build",
            "q_llm_corpus_diff",
            "q_llm_decode_media",
            "q_llm_dup_triangles",
            "q_llm_embed_dimstats",
            "q_llm_frame_sample",
            "q_llm_freq_spectrum",
            "q_llm_hamming_spectrum",
            "q_llm_ingest_dedup",
            "q_llm_ingest_jsonl",
            "q_llm_link_extract",
            "q_llm_lm_score",
            "q_llm_maxsim",
            "q_llm_media_sniff",
            "q_llm_mixture_sample",
            "q_llm_ngram_lm",
            "q_llm_novelty",
            "q_llm_quota_sample",
            "q_llm_refresh_e2e",
            "q_llm_repeated_chunks",
            "q_llm_scd2",
            "q_llm_shard_balance",
            "q_llm_source_leak",
            "q_llm_surprisal",
            "q_llm_train_order",
            "q_llm_winnow",
            "q_skew_audit",
            "q_ts_gapfill",
        )
    },
    # (e) every other ever-driver-sampled query pins at 100. The names on
    #     the first line are the r4-era freshness rows displaced by this
    #     round's own mid-round additions (one per addition, zero-lag
    #     rule) — they HEAD the round-15 freshness queue.
    **{
        n: 100
        for n in (
            "q_agg_boolcond",
            "q_agg_decimal",
            "q_agg_listagg",
            "q_sort_nulls_first",
            "q_agg_approx_distinct",
            "q_agg_argmax",
            "q_agg_bivariate",
            "q_agg_bootstrap_ci",
            "q_agg_collect",
            "q_agg_cov_matrix",
            "q_agg_cube",
            "q_agg_distinct",
            "q_agg_entropy",
            "q_agg_filter_clause",
            "q_agg_gini",
            "q_agg_global",
            "q_agg_group",
            "q_agg_grouping_id",
            "q_agg_grouping_sets",
            "q_agg_having",
            "q_agg_hhi",
            "q_agg_histogram",
            "q_agg_mode",
            "q_agg_multi_distinct",
            "q_agg_paired_ttest",
            "q_agg_percentile",
            "q_agg_percentile_approx",
            "q_agg_rollup",
            "q_agg_skew_kurtosis",
            "q_agg_stats",
            "q_agg_theil",
            "q_agg_weighted_median",
            "q_agg_welch_t",
            "q_agg_winsorized_mean",
            "q_benford_audit",
            "q_canary_array_semantics",
            "q_canary_decimal_sum",
            "q_canary_empty_agg",
            "q_canary_filter_null_agg",
            "q_canary_floor_cents",
            "q_canary_int_sum",
            "q_canary_month_trunc",
            "q_canary_neg_div",
            "q_canary_nullable_bigint",
            "q_canary_range_frame",
            "q_canary_round_double",
            "q_canary_string_order",
            "q_canary_try_arith",
            "q_canary_unicode_case",
            "q_cohort_ltv",
            "q_customer_rfm",
            "q_customer_tier_migration",
            "q_cusum_changepoint",
            "q_events_anova",
            "q_events_attribution",
            "q_events_burst_episodes",
            "q_events_chisq_shift",
            "q_events_conversion_rate",
            "q_events_cuped",
            "q_events_dau_wau",
            "q_events_decay_engagement",
            "q_events_did",
            "q_events_entropy_rate",
            "q_events_funnel",
            "q_events_hourly_profile",
            "q_events_inter_arrival",
            "q_events_kruskal",
            "q_events_ks_test",
            "q_events_lifecycle",
            "q_events_lift_matrix",
            "q_events_logrank",
            "q_events_mad_outliers",
            "q_events_mannwhitney",
            "q_events_markov_stationary",
            "q_events_mde",
            "q_events_path_prefix",
            "q_events_proportion_ztest",
            "q_events_seq_patterns",
            "q_events_spearman",
            "q_events_survival",
            "q_events_transitions",
            "q_filter_compound",
            "q_filter_like",
            "q_filter_null",
            "q_fn_array",
            "q_fn_binary",
            "q_fn_bitwise",
            "q_fn_case",
            "q_fn_cast",
            "q_fn_datetime",
            "q_fn_explode",
            "q_fn_hash",
            "q_fn_json",
            "q_fn_map",
            "q_fn_math",
            "q_fn_posexplode",
            "q_fn_regex",
            "q_fn_split",
            "q_fn_string",
            "q_fn_struct",
            "q_fn_variant",
            "q_geo_cell_density",
            "q_geo_dbscan",
            "q_geo_dist_join",
            "q_geo_geofence",
            "q_geo_hotspot",
            "q_geo_knn",
            "q_graph_copurchase",
            "q_join_anti",
            "q_join_asof",
            "q_join_asof_forward",
            "q_join_asof_nearest",
            "q_join_asof_tolerance",
            "q_join_broadcast",
            "q_join_bucketed",
            "q_join_cross",
            "q_join_full",
            "q_join_inner",
            "q_join_interval",
            "q_join_interval_bucketed",
            "q_join_left",
            "q_join_multiway",
            "q_join_null_safe",
            "q_join_right",
            "q_join_salted",
            "q_join_semi",
            "q_join_theta",
            "q_kinesis_decode_csv",
            "q_kinesis_decode_json",
            "q_kinesis_efo_plan",
            "q_kinesis_hotkey_audit",
            "q_kinesis_lag_audit",
            "q_kinesis_lease_plan",
            "q_kinesis_replay_window",
            "q_kinesis_reshard_plan",
            "q_kinesis_retention_plan",
            "q_kinesis_schema",
            "q_kinesis_shard_route",
            "q_kinesis_throughput_audit",
            "q_lateral_topn",
            "q_llm_band_assign",
            "q_llm_band_recall_24",
            "q_llm_band_tuning",
            "q_llm_bigram_topk",
            "q_llm_bloom_fpr",
            "q_llm_bm25",
            "q_llm_bpe_batch",
            "q_llm_bucket_stats",
            "q_llm_char_entropy",
            "q_llm_chunk",
            "q_llm_cluster_keep_best",
            "q_llm_cluster_purity",
            "q_llm_cluster_reweight",
            "q_llm_cluster_tightness",
            "q_llm_cms_heavy",
            "q_llm_code_detect",
            "q_llm_compress_proxy",
            "q_llm_contrastive_pairs",
            "q_llm_corpus_stats",
            "q_llm_cross_dup_matrix",
            "q_llm_curate_e2e",
            "q_llm_curriculum_bins",
            "q_llm_data_card",
            "q_llm_decontaminate",
            "q_llm_dedup_cluster",
            "q_llm_dedup_containment",
            "q_llm_dedup_containment_lsh",
            "q_llm_dedup_editdist",
            "q_llm_dedup_embed",
            "q_llm_dedup_exact",
            "q_llm_dedup_jaccard",
            "q_llm_dedup_method_overlap",
            "q_llm_dedup_minhash",
            "q_llm_dedup_ngram",
            "q_llm_dedup_normalized",
            "q_llm_dedup_precision",
            "q_llm_dedup_semantic",
            "q_llm_dedup_shard_locality",
            "q_llm_dedup_simhash",
            "q_llm_dedup_survivors",
            "q_llm_dedup_yield_curve",
            "q_llm_diversity",
            "q_llm_domain_quality",
            "q_llm_dsir_weight",
            "q_llm_dup_centrality",
            "q_llm_dup_degree",
            "q_llm_dup_inflation",
            "q_llm_dup_kcore",
            "q_llm_dup_pagerank",
            "q_llm_dup_span_ratio",
            "q_llm_dup_two_hop",
            "q_llm_embed_drift",
            "q_llm_embed_isotropy",
            "q_llm_embed_pca_power",
            "q_llm_epoch_schedule",
            "q_llm_fertility",
            "q_llm_filter_funnel",
            "q_llm_fingerprint",
            "q_llm_gopher_rules",
            "q_llm_hapax_rate",
            "q_llm_hard_negatives",
            "q_llm_heaps_fit",
            "q_llm_heavy_hitters",
            "q_llm_heavy_hitters_sketch",
            "q_llm_host_cap_enforce",
            "q_llm_ingest_cdc",
            "q_llm_ingest_neardup",
            "q_llm_inverted_index",
            "q_llm_js_divergence",
            "q_llm_keyword_stuffing",
            "q_llm_kmeans",
            "q_llm_kmeans_mstep",
            "q_llm_kmeans_train",
            "q_llm_kmv_distinct",
            "q_llm_kmv_setops",
            "q_llm_knn_label_vote",
            "q_llm_langid",
            "q_llm_langid_confusion",
            "q_llm_length_profile",
            "q_llm_margin_sample",
            "q_llm_media_dedup",
            "q_llm_media_dims",
            "q_llm_media_dims_jpeg",
            "q_llm_media_phash",
            "q_llm_minhash_portable",
            "q_llm_mixture",
            "q_llm_mixture_temperature",
            "q_llm_mmr_select",
            "q_llm_mrr",
            "q_llm_multimodal",
            "q_llm_ndcg",
            "q_llm_ngram_novelty_decay",
            "q_llm_pack",
            "q_llm_pad_waste",
            "q_llm_paragraph_dedup",
            "q_llm_pii_scrub",
            "q_llm_pmi_bigrams",
            "q_llm_pq_adc_topk",
            "q_llm_pq_distortion",
            "q_llm_pq_encode",
            "q_llm_prefix_dup",
            "q_llm_probe_curve",
            "q_llm_profile",
            "q_llm_psi_drift",
            "q_llm_quality",
            "q_llm_quality_auc",
            "q_llm_quality_calibrate",
            "q_llm_quality_dup_matrix",
            "q_llm_quality_ece",
            "q_llm_quality_isotonic",
            "q_llm_quality_len_matrix",
            "q_llm_rake_keywords",
            "q_llm_random_proj",
            "q_llm_rater_kappa",
            "q_llm_readability",
            "q_llm_recall_at_k",
            "q_llm_rejection_sample",
            "q_llm_repetition",
            "q_llm_rrf_fusion",
            "q_llm_sample_hash",
            "q_llm_sample_reservoir",
            "q_llm_semantic_cell_audit",
            "q_llm_semantic_clusters",
            "q_llm_semantic_dedup_e2e",
            "q_llm_semantic_outliers",
            "q_llm_semantic_survivors",
            "q_llm_semantic_yield",
            "q_llm_shingle_df_audit",
            "q_llm_sim_ivf",
            "q_llm_sim_lsh",
            "q_llm_sim_topk",
            "q_llm_source_vocab_overlap",
            "q_llm_span_coverage",
            "q_llm_split_leakage",
            "q_llm_split_stratified",
            "q_llm_submodular_coverage",
            "q_llm_substring_dup",
            "q_llm_substring_sketch",
            "q_llm_template_mine",
            "q_llm_textscore",
            "q_llm_tfidf",
            "q_llm_tokcount",
            "q_llm_token_budget",
            "q_llm_token_yield_funnel",
            "q_llm_tokenize",
            "q_llm_unigram_entropy",
            "q_llm_url_host_audit",
            "q_llm_vec_ops",
            "q_llm_vec_quantize",
            "q_llm_vocab_coverage",
            "q_llm_weighted_sample",
            "q_llm_whitespace_anomaly",
            "q_llm_zipf_fit",
            "q_orders_littles_law",
            "q_orders_priority_aging",
            "q_pareto_deciles",
            "q_part_abc_xyz",
            "q_part_price_elasticity",
            "q_part_safety_stock",
            "q_pivot",
            "q_privacy_bounded_contrib",
            "q_privacy_cell_suppression",
            "q_privacy_dp_hist",
            "q_privacy_kanon",
            "q_privacy_ldiversity",
            "q_privacy_tcloseness",
            "q_project_arith",
            "q_sales_pvm_bridge",
            "q_scan_full",
            "q_scan_pruned",
            "q_scan_pushdown",
            "q_set_except",
            "q_set_except_all",
            "q_set_intersect",
            "q_set_intersect_all",
            "q_set_union_all",
            "q_set_union_distinct",
            "q_sort_multi",
            "q_sql_recursive_spine",
            "q_stream_dedup_keys",
            "q_stream_session",
            "q_stream_sliding",
            "q_stream_tumbling",
            "q_subquery_correlated_scalar",
            "q_subquery_exists",
            "q_subquery_scalar",
            "q_topk",
            "q_topk_per_group",
            "q_trade_flow_matrix",
            "q_ts_acf",
            "q_ts_backlog",
            "q_ts_ccf",
            "q_ts_croston",
            "q_ts_ewma_cross",
            "q_ts_fano_dispersion",
            "q_ts_forecast_backtest",
            "q_ts_holt_linear",
            "q_ts_holt_winters_mul",
            "q_ts_hurst",
            "q_ts_lttb",
            "q_ts_mann_kendall",
            "q_ts_ohlc",
            "q_ts_pacf",
            "q_ts_peaks",
            "q_ts_rsi",
            "q_ts_runs_test",
            "q_ts_seasonal_forecast",
            "q_ts_seasonal_outliers",
            "q_ts_seasonality",
            "q_ts_theil_sen",
            "q_ts_time_weighted",
            "q_ts_trend_forecast",
            "q_udaf_grouped",
            "q_udf_pandas",
            "q_udf_scalar",
            "q_udtf_expand",
            "q_unpivot",
            "q_win_bollinger",
            "q_win_distribution",
            "q_win_drawdown",
            "q_win_first_last",
            "q_win_lag_lead",
            "q_win_mom_growth",
            "q_win_nth_value",
            "q_win_ntile",
            "q_win_order_concurrency",
            "q_win_range_frame",
            "q_win_rank",
            "q_win_rolling_corr",
            "q_win_rolling_median",
            "q_win_rolling_slope",
            "q_win_running",
            "q_win_running_distinct",
            "q_win_skyline",
            "q_win_streaks",
            "q_zorder_layout",
        )
    },
}

_loaded = False


def query(
    name: str, oracle: str | None = None, priority: int = 100
) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optional DuckDB oracle).

    ``priority`` orders the registry the round driver iterates: the driver's
    CORRECTNESS window covers roughly the first 50 registered queries, so
    lower numbers land inside the checked window. Convention:

    * 0  — queries that failed the previous driver round (re-verify first)
    * 10 — canary queries isolating one fragile primitive each
    * 20 — queries that have never had a driver CORRECTNESS row
    * 30 — queries newly added this round (first driver look)
    * 100 (default) — everything else, in module registration order

    Per-round rotation lives in ``_PRIORITY_OVERRIDES`` below, which takes
    precedence over the decorator value — decorators keep the priority at
    time of authorship, the override map is the one place each round's
    rotation is applied. ROTATION PLAN each round (read the latest
    CORRECTNESS_r{N}.json first): (a) any FAIL/ERR rows get override 0;
    (b) queries that have STILL never received a driver row move to
    override 20; (c) every query with a driver-green row is pinned at
    override 100 (explicitly, so a <100 decorator priority can never leak
    it back into the window). Canaries stay at 10 permanently.
    tests/test_registry_rotation.py asserts the resulting window.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        _PRIORITY[name] = (_PRIORITY_OVERRIDES.get(name, priority), len(_PRIORITY))
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        try:
            importlib.import_module(f"{__package__}.{mod}")
        except ModuleNotFoundError as e:
            # Tolerate not-yet-written modules during incremental build, but
            # re-raise genuine import errors inside existing modules.
            if e.name and e.name.startswith(__package__):
                continue
            raise
    _loaded = True


def _ordered_names() -> list[str]:
    return sorted(_QUERIES, key=lambda n: _PRIORITY[n])


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return {n: _QUERIES[n] for n in _ordered_names()}


def all_oracles() -> dict[str, str]:
    load_all()
    return {n: _ORACLES[n] for n in _ordered_names() if n in _ORACLES}
