"""Query registry — the single source of truth behind __spark_entry__.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers one QuerySpec: a Spark builder (spark, sf_dir) ->
DataFrame and, where the semantics are ANSI-SQL-expressible, an oracle SQL
string for the driver's DuckDB comparison.

Determinism contract for oracle-checked queries:
  * every computed column is aliased identically in Spark and SQL;
  * SUM/AVG over doubles goes through an exact DECIMAL accumulator and is
    cast back to DOUBLE at the end — aggregation order then cannot change
    the result, so Spark's partial aggregates and DuckDB agree bitwise;
  * window orderings include a unique tiebreaker column;
  * per-row double arithmetic is IEEE-deterministic and needs no special
    handling.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERY_REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, headline=headline, doc=doc or fn.__doc__ or "", tags=tags
        )
        return fn

    return wrap


# The driver verifies the FIRST 50 registry entries in insertion order
# (VERDICT r1). Spend that budget where verification adds information:
# queries with exact oracles that have no green driver row yet (new this
# round) go first; previously driver-green queries follow in their
# round-2 verified order (re-verification is cheap insurance, not new
# signal) — except a handful of simple twice-green relational queries
# demoted to make window room; rows-only queries (no DuckDB oracle →
# weaker check) go last.
_ROUND1_DRIVER_GREEN = frozenset(
    {
        "anti_join_fk", "bottomk_suppliers", "broadcast_lookup_default",
        "cube_sales_priority", "date_rollup", "date_validity",
        "doc_assembly", "exists_bulk_orders", "fact_build",
        "first_last_order_span", "flatten_explode", "hash_split_train_val",
        "inactive_customers_except", "lead_next_order_gap",
        "media_decode_meta", "media_features", "media_frame_sample",
        "media_resize_dims", "median_disc_by_priority",
        "ntile_acctbal_quartiles", "orc_roundtrip_revenue",
        "regex_extract_id_buckets", "rolling_30d_revenue", "sales_rollup",
        "scalar_stats", "scalar_subquery_small_qty", "shard_round_robin",
        "sql_passthrough", "statement_query", "stddev_exact_by_flag",
        "stratified_sample_docs", "topk_customers", "union_by_name",
        "unique_key_check", "unpivot_lineitem_measures",
        "validation_summary",
    }
)

# CORRECTNESS_r02.json: all 50 verified, 50 green (key order preserved —
# it is the round-2 window priority and stays the re-verification order),
# except fact_build hoisted to the front: it is the flagship entry()
# query and must never age out of the window as new queries land.
_ROUND2_DRIVER_GREEN = (
    "fact_build",
    "distinct_users_exact", "converting_users_intersect", "event_type_pivot",
    "range_attribution_windows", "asof_purchase_attribution",
    "json_extract_cast", "merge_dedup_latest", "dup_detection",
    "conditional_routing", "running_window", "sessionization",
    "map_functions_props", "string_functions_matrix", "date_functions_matrix",
    "rank_family_segments", "grouping_sets_mixed", "higher_order_array_ops",
    "top3_orders_per_segment", "not_in_suppliers_null_aware",
    "like_pattern_filter", "union_distinct_actors", "recursive_month_series",
    "quantiles_disc_by_priority", "stream_windowed_counts",
    "stream_stream_join", "stream_upsert_materialize",
    "stream_dedup_within_watermark", "stream_static_enrich",
    "stream_dedup_docs", "dedup_exact", "text_quality", "doc_fingerprint",
    "lang_id", "dedup_clusters", "ngram_jaccard", "minhash_portable_pairs",
    "simhash_portable_fingerprints", "calendar_fill_daily_revenue",
    "funnel_view_click_purchase", "ann_cosine_topk", "ann_lsh_bucketed",
    "cosine_near_dup_windowed", "embedding_norms", "exists_bulk_orders",
    "inactive_customers_except", "sales_rollup",
    "statement_query", "anti_join_fk", "broadcast_lookup_default",
)

# CORRECTNESS_r03.json: the round-3 window, 50/50 green (key order
# preserved — it becomes the re-verification priority among green rows).
_ROUND3_DRIVER_GREEN = (
    "tfidf_top_terms", "quality_gopher", "decontam_ngram_overlap",
    "pii_redact", "time_bucket_ohlc", "salted_join_segment_revenue",
    "embedding_quantize_int8", "ngram_top_bigrams", "gap_fill_interpolate",
    "doc_chunk_overlap", "pack_sequences", "dedup_incremental_anti",
    "quality_weighted_sample", "interval_overlap_sessions", "zscore_outliers",
    "label_centroids", "value_histogram", "scd2_user_tiers",
    "mixture_rebalance_sample", "token_budget_head", "curation_pipeline_e2e",
    "user_value_trend", "user_event_type_sets", "ewma_user_values",
    "lttb_downsample", "stream_time_bucket_ohlc", "stream_session_windows",
)

# CORRECTNESS_r04.json: the round-4 window, 50/50 green (key order
# preserved — becomes the re-verification priority among green rows).
_ROUND4_DRIVER_GREEN = (
    "fact_build", "minhash_portable_pairs", "simhash_portable_fingerprints",
    "bloom_filter_probe", "rfm_segmentation", "twap_user_value",
    "readability_proxy", "dup_span_marking", "event_trigram_top",
    "minmax_scale_events", "copurchase_degree_hist", "copurchase_triangles",
    "minhash_portable_incremental", "segment_dedup_boilerplate",
    "boilerplate_strip_stats", "type_token_ratio", "vocab_build_topn",
    "near_dup_purge_e2e", "tokenize_to_ids", "containment_scores",
    "dedup_keep_best", "split_leakage_check", "weighted_sample_aes",
    "corr_qty_price", "skew_kurtosis_quantity", "lang_entropy_by_source",
    "mode_priority_by_segment", "weighted_avg_discount",
    "percentile_cont_priceband", "table_checksum_orders",
    "event_type_bitmask", "full_outer_reconcile_halves",
    "islands_user_activity", "chi_square_segment_priority",
    "cohort_retention_matrix", "target_encode_priority",
    "entity_resolution_blocked", "quantile_binning_migration",
    "zorder_bucket_stats", "profile_lineitem_columns", "time_rollup_revenue",
    "sliding_7d_active_users", "event_transition_matrix",
    "revenue_share_by_nation", "pareto_abc_parts", "regression_price_by_qty",
    "vwap_weekly_priceband", "mad_outlier_summary", "time_to_convert_stats",
    "knn_join_topk",
)

# Flagships that must NEVER age out of the 50-entry window, whatever
# lands in a new round: the entry() query and the portable dedup
# miniatures that stand in for the engine-specific MinHash/SimHash.
_PINNED = ("fact_build", "minhash_portable_pairs", "simhash_portable_fingerprints")

# CORRECTNESS_r05.json: the round-5 window, 50/50 green (key order
# preserved — becomes the re-verification priority among green rows).
_ROUND5_DRIVER_GREEN = (
    "fact_build", "minhash_portable_pairs", "simhash_portable_fingerprints",
    "hll_portable_estimate", "temperature_resample_sources",
    "benford_first_digit", "tpch_q1_pricing_summary",
    "seasonal_decompose_dow", "cusum_changepoint", "theil_sen_daily_trend",
    "anomaly_dow_hour_baseline", "centroid_assign_fixed",
    "random_projection_jl", "quantized_cosine_pairs", "k_anonymity_audit",
    "embedding_covariance", "zipf_fit_vocab", "attribution_linear",
    "feature_hash_vectorize", "link_prediction_common_neighbors",
    "jaccard_prefix_filter_join", "triplet_sample_contrastive",
    "unigram_logprob_quality", "corpus_report_by_source",
    "token_dropout_augment", "bigram_interpolated_logprob",
    "pit_join_click_tier", "rolling_purchase_features", "acf_daily_revenue",
    "basket_association_rules", "cms_heavy_hitters", "km_churn_curve",
    "quantile_normalize_by_type", "mad_outlier_days", "pmi_collocations",
    "clustering_eval_ari", "feature_mi_by_dim", "markov_sequence_score",
    "silhouette_fixed_centroids", "path_topk_sequences",
    "funnel_pattern_match", "item_cf_cosine", "period_end_balance",
    "event_debounce_keep_first", "decay_weighted_engagement",
    "max_drawdown_daily_revenue", "rsi_14_daily_revenue",
    "bollinger_breakout_days", "revenue_concentration_hhi",
    "schema_drift_report",
)

# The round-6 verification window, fixed in the order the queries have
# been WAITING (round-5 batch-2..9 additions first, in module import /
# registration order). Without this pin, later-session additions to
# earlier modules would displace the oldest never-verified queries from
# the 50-slot window purely by module import order. 42 never-verified
# oracle-backed queries + 3 pinned = 45; the 5 spare slots go to this
# session's earliest round-6 additions (appended below as they land).
_ROUND6_WINDOW = (
    "bfs_levels_copurchase", "lang_id_confusion", "source_vocab_overlap",
    "bootstrap_mean_ci", "trimmed_mean_priority", "ks_two_sample_values",
    "ab_conversion_ztest", "mann_whitney_u_test", "cuped_adjusted_ab",
    "woe_iv_acctbal_urgent", "ols_price_qty_discount", "lift_gains_deciles",
    "isotonic_calibration_deciles", "ab_power_analysis",
    "diff_in_diff_readout", "stream_anomaly_zscore", "grid_density_clusters",
    "ann_recall_eval", "mlm_mask_positions", "span_corruption_plan",
    "bpe_portable_merges", "cluster_majority_prf", "embedding_drift_report",
    "user_burstiness", "holt_linear_forecast", "gini_customer_revenue",
    "ar_aging_buckets", "revenue_decomposition_reconcile",
    "freshness_lag_by_type", "l_diversity_audit", "fk_orphan_scorecard",
    "charset_profile_by_source", "dp_noisy_counts", "psi_feature_drift",
    "join_key_skew_report", "t_closeness_audit", "bm25_topk_docs",
    "rrf_hybrid_topk", "kwic_concordance", "ndcg_lexical_vs_dense",
    "ivm_daily_revenue_refresh", "cdc_chunk_dedup",
    # round-6 batch-1 additions (5 spare slots): the TPC-H classics
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q10_returned_items",
    "tpch_q14_promo_effect",
)

# CORRECTNESS_r06.json: the round-6 window, 50/50 green (key order
# preserved — becomes the re-verification priority among green rows).
_ROUND6_DRIVER_GREEN = _ROUND6_WINDOW

# The round-7 verification window: the 3 pinned flagships, then the 8
# round-7 additions (the sixteen remaining TPC-H queries — seven
# near-verbatim plus the nine ADAPTED where the schema lacks the
# canonical columns — + kcore_copurchase and PageRank, newly
# oracle-exact), then 30 rotation slots re-verifying the LONGEST-
# unverified oracle-backed queries (green in r1, aged out of every
# window since — computed from the CORRECTNESS_r0{1..6} files as
# min(last-verified round), oldest first, names sorted within a round).
_ROUND7_WINDOW = (
    # round-7 additions (never driver-verified)
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q13_order_count_distribution", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_volume_customers",
    "tpch_q22_global_sales_opportunity", "kcore_copurchase",
    "pagerank_portable_fixedpoint",
    "tpch_q2_min_cost_supplier", "tpch_q4_order_priority",
    "tpch_q9_product_type_profit", "tpch_q11_important_stock",
    "tpch_q12_priority_pivot", "tpch_q16_parts_supplier_count",
    "tpch_q19_disjunctive_revenue", "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    # round-7 curation batch (published-method ops, all oracle-exact)
    "semdedup_prune", "margin_knn_scores", "dsir_importance_weights",
    "power_iteration_portable",
    # round-7 batch 2 (published-method ops, all oracle-exact); these
    # take the slots of the four rotation entries noted below
    "unimax_allocation", "fisher_lda_quality", "pq_encode_fixed",
    "kcenter_coreset_greedy",
    # round-7 batch 3 (published-method ops, all oracle-exact)
    "mmr_rerank", "char_entropy_quality", "tokenizer_fertility_by_source",
    # round-7 batch 4-5 (published-method ops, all oracle-exact;
    # winnowing_fingerprints yields its slot to batch 12 — its entire
    # selection pipeline is re-derived inside winnowing_overlap_pairs'
    # oracle, which stays in the window)
    "doremi_domain_weights", "distinct_ngram_diversity",
    # round-7 batch 6 (published-method ops, all oracle-exact)
    "ccnet_perplexity_buckets", "hard_negative_mining",
    "length_grouped_batching",
    # round-7 batch 7 (published-method ops, all oracle-exact)
    "winnowing_overlap_pairs", "decontam_embedding_sim",
    "filter_agreement_kappa",
    # round-7 batch 8 (published-method ops, all oracle-exact)
    "spearman_quality_scores", "hill_tail_index",
    "stratified_kfold_assign",
    # round-7 batch 9 (published-method ops, all oracle-exact)
    "quality_ensemble_gate", "bits_per_byte_by_source",
    # round-7 batch 10 (the dedup rollout gate as a query)
    "lsh_recall_eval",
    # round-7 batch 11 (published-method ops, all oracle-exact)
    "adamic_adar_link_prediction", "minhash_estimation_error",
    # round-7 batch 12 (published-method ops, all oracle-exact)
    "near_dup_split_leakage", "ngram_novelty_rate",
    # (the r1 rotation tier is now fully yielded: media_decode_meta,
    # its final member, gave its slot to batch 12 — it stays green in
    # every bench run, the local parity suite, and the media pytest
    # family. The window is 3 flagships + 47 never-verified oracle
    # rows.)
    # (rolling_30d_revenue / media_frame_sample / median_disc_by_priority
    # yield their slots to the batch-3 ops; orc_roundtrip_revenue /
    # media_resize_dims to the batch-4 ops; ntile_acctbal_quartiles to
    # batch 5; bottomk_suppliers / cube_sales_priority / date_validity
    # to batch 6; doc_assembly / flatten_explode / hash_split_train_val
    # to batch 7; first_last_order_span / lead_next_order_gap /
    # regex_extract_id_buckets to batch 8; stratified_sample_docs /
    # stddev_exact_by_flag to batch 9; topk_customers to batch 10;
    # media_features / validation_summary to batch 11 — never-verified
    # oracle rows buy more signal; all stay green in the local parity
    # suite (and topk_customers in every bench run).)
    # (scalar_stats / scalar_subquery_small_qty / shard_round_robin /
    # sql_passthrough yield their slots to the batch-2 curation ops —
    # same never-verified-first rationale; all four stay green in the
    # local two-SF parity suite.)
    # (union_by_name / unique_key_check / unpivot_lineitem_measures,
    # the next-oldest candidates, yield their slots to the curation
    # batch — never-verified oracle rows buy more signal; all three
    # stay green in the local two-SF parity suite.)
    # (the 9-slot "last green r2" rotation tier and dup_detection yield
    # their slots to the adapted-TPC-H batch: a never-verified oracle
    # row buys more signal than a third verification of a green query;
    # the r2 tier stays covered by the local two-SF parity suite.)
)

# CORRECTNESS_r07.json: the round-7 window, 50/50 green.
_ROUND7_DRIVER_GREEN = _ROUND7_WINDOW

# The round-8 verification window (VERDICT r7 item 1): cumulative
# driver-green now covers 294/295 oracle-backed entries; the single
# never-green oracle row (winnowing_fingerprints — its oracle has
# existed since round 7 but never made a window) goes first, followed
# by this round's new oracle-exact additions, then the 13 rows-only
# entries — none of which has EVER been inside a driver window, so the
# official artifact has no record of them even running; a driver
# rows-only row is weaker than an oracle row but stronger than
# nothing. The remaining slots re-verify the longest-unverified green
# rows (last green in round 1, aged out of every window since).
_ROUND8_WINDOW = (
    # the one oracle-backed entry with no driver-green row anywhere
    "winnowing_fingerprints",
    # round-8 additions (oracle-exact, never driver-verified)
    "gk_portable_quantiles", "kmeans_portable_lloyd",
    "fastss_edit1_pairs", "tfidf_cosine_pairs", "self_bleu_proxy",
    "bucketed_colocated_join", "kmv_theta_sketch_pairs",
    "conformal_calibration", "schema_evolution_merge_read",
    "als_half_step_portable", "dpp_partition_pruned_join",
    "fellegi_sunter_linkage", "lpa_communities_fixed",
    # rows-only entries, never windowed: record official rows-only runs
    "minhash_lsh_pairs", "simhash_fingerprints", "simhash_near_dup_pairs",
    "ann_ivf_topk", "ann_ivf_persisted_topk", "pagerank_copurchase",
    "power_iteration_top_pc", "bpe_learn_merges", "bpe_segment_words",
    "stream_sessionization", "approx_distinct_users",
    "value_quantiles_sketch", "compression_ratio_quality",
    # rotation: longest-unverified green rows (last green r1), oldest
    # tier first, alphabetical within the tier — 50 minus the above
    # minus the 3 pinned flagships
    "bottomk_suppliers", "cube_sales_priority", "date_rollup",
    "date_validity", "doc_assembly", "first_last_order_span",
    "flatten_explode", "hash_split_train_val", "lead_next_order_gap",
    "media_decode_meta", "media_features", "media_frame_sample",
    "media_resize_dims", "median_disc_by_priority",
    "ntile_acctbal_quartiles", "orc_roundtrip_revenue",
    "regex_extract_id_buckets", "rolling_30d_revenue", "scalar_stats",
    "scalar_subquery_small_qty", "shard_round_robin", "sql_passthrough",
    "stddev_exact_by_flag", "stratified_sample_docs", "topk_customers",
    "union_by_name", "unique_key_check", "unpivot_lineitem_measures",
    "validation_summary",
)

# Twice-green simple relational queries: verified in both r1 and r2 (or
# structurally equivalent to still-windowed queries) — demoted below the
# rest of the green set so new queries fit in the 50-entry window without
# pushing out a flagship.
_DEMOTE = frozenset(
    {
        "exists_bulk_orders", "inactive_customers_except", "sales_rollup",
        "anti_join_fk", "broadcast_lookup_default", "statement_query",
        "like_pattern_filter", "union_distinct_actors",
        "quantiles_disc_by_priority", "top3_orders_per_segment",
        "date_functions_matrix", "string_functions_matrix",
        "rank_family_segments", "higher_order_array_ops",
        "doc_fingerprint", "map_functions_props",
        "json_extract_cast", "lang_id", "conditional_routing", "running_window",
        "dup_detection",
    }
)


def driver_order(registry: dict[str, QuerySpec]) -> list[str]:
    """Registry names ordered for the driver's truncated verify window.

    Tiers: (0) pinned flagships — always inside the window; (1) new
    oracle-backed queries never driver-verified (round-4 additions) —
    the window budget is spent here; (2) green in a prior round, most
    recent round first (cheap re-verification insurance); (3) demoted
    twice-green simple queries; (4) rows-only (no oracle → weakest
    check) last.
    """
    r2_rank = {n: i for i, n in enumerate(_ROUND2_DRIVER_GREEN)}
    r3_rank = {n: i for i, n in enumerate(_ROUND3_DRIVER_GREEN)}
    r4_rank = {n: i for i, n in enumerate(_ROUND4_DRIVER_GREEN)}
    r5_rank = {n: i for i, n in enumerate(_ROUND5_DRIVER_GREEN)}
    r6_rank = {n: i for i, n in enumerate(_ROUND6_DRIVER_GREEN)}
    r7_rank = {n: i for i, n in enumerate(_ROUND7_DRIVER_GREEN)}
    r8_rank = {n: i for i, n in enumerate(_ROUND8_WINDOW)}
    green = (
        set(r2_rank) | set(r3_rank) | set(r4_rank) | set(r5_rank)
        | set(r6_rank) | set(r7_rank) | _ROUND1_DRIVER_GREEN
    )
    names = list(registry)

    def key(name: str):
        spec = registry[name]
        if name in _PINNED:
            tier = 0
        elif name in r8_rank:
            tier = 1  # this round's fixed verification window
        elif spec.oracle is None:
            tier = 5
        elif name in _DEMOTE:
            tier = 4
        elif name in green:
            tier = 3
        else:
            tier = 2  # newer never-verified: next round's window
        if tier == 1:
            return (tier, r8_rank[name], names.index(name))
        # among green rows, re-verify the most recent round's set first
        # (it contains this round's behavior-touched queries), then r6,
        # r5, r4, r3, r2
        rank = r7_rank.get(
            name,
            len(r7_rank)
            + _rank6(name),
        )
        return (tier, rank, names.index(name))

    def _rank6(name: str) -> int:
        return r6_rank.get(
            name,
            len(r6_rank)
            + r5_rank.get(
                name,
                len(r5_rank)
                + r4_rank.get(
                    name,
                    len(r4_rank)
                    + r3_rank.get(
                        name, len(r3_rank) + r2_rank.get(name, len(r2_rank))
                    ),
                ),
            ),
        )

    return sorted(names, key=key)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so the registry is fully populated.

    Returned dict is in driver-priority order (see :func:`driver_order`):
    the driver's CORRECTNESS check truncates to the first 50 entries.
    """
    from dynaledger_spark.plans import (  # noqa: F401
        queries_approx,
        queries_core,
        queries_feature,
        queries_graph,
        queries_multimodal,
        queries_pipeline,
        queries_sampling,
        queries_sql_ext,
        queries_stats,
        queries_streaming,
        queries_text,
        queries_timeseries,
        queries_vector,
        queries_mlprep,  # intentionally last: round-4 batch-2 additions
        queries_lm,  # round-4 batch-3, same rationale
        queries_featurestore,  # round-4 batch-5, same rationale
        queries_eval,  # round-4 batch-6, same rationale
        queries_behavior,  # round-5 batch-1: journey/recommender analytics
        # rank behind the already-windowed tier-1 queries (driver window
        # is full at 50; these are parity-proven locally and enter the
        # window in round 5)
        queries_finance,  # round-5 batch-2: technical indicators / concentration
        queries_quality,  # round-5 batch-2: governance, privacy, charset, DP
        queries_retrieval,  # round-5 batch-2: BM25 + RRF hybrid search
        queries_incremental,  # round-5 batch-4: IVM refresh, CDC chunk dedup
        # batch-2 additions rank behind batch-1 in tier 1: the round-5
        # window is already full, so they enter the driver window in
        # round 6; locally parity-proven at both SFs like every batch
        queries_tpch,  # round-6 batch-1: TPC-H Q3/Q5/Q6/Q10/Q14
        queries_sparse,  # round-8: FastSS edit join + sparse TF-IDF cosine
    )

    return {name: QUERY_REGISTRY[name] for name in driver_order(QUERY_REGISTRY)}
