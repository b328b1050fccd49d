"""Named query assemblies wired into __spark_entry__.py.

Each module exposes:
    QUERIES: dict[str, Callable[(SparkSession, sf_dir: str), DataFrame]]
    ORACLES: dict[str, str]  — ANSI SQL DuckDB equivalents (omitted for
             genuinely non-SQL-expressible ops → driver does rows-only check)

Differential-testing conventions (driver compares row-count + schema +
order-insensitive value hash, columns sorted by name):
    - timestamps are returned as epoch-millis BIGINT, never TimestampType
      (timezone/precision proof);
    - every float aggregate is ROUND()ed to a fixed scale in BOTH dialects
      (summation order differs between engines; last-ulp noise is expected);
    - ranks/counts cast to BIGINT in both dialects;
    - every computed column aliased identically in both dialects.
"""

from . import advanced, enterprise, llm_data, reference_queries, relational, tpch_extra


# Registration order is load-bearing: the driver's CORRECTNESS snapshot
# verifies the FIRST 50 entries of queries() (dict insertion order).
# Promotion is GLOBAL as of round 5: every name in _PROMOTED is emitted
# first, in _PROMOTED order, REGARDLESS of which module defines it, then
# the remaining queries follow in module order.  (The old within-module
# promotion could never surface tpch_extra/relational rows — those modules
# sit last, so their promotions landed at position 120+ and the driver
# window never reached them.  That is exactly how 41 queries accumulated
# zero driver rows through r4.)
#
# Window accounting for THIS round (r6): after r5 the union of
# CORRECTNESS_r01..r05 covers 170 of 173 — the only rows ever missing a
# driver look are the three added post-window in r5.  _PROMOTED therefore
# lists exactly those three plus every query NEW in r6; once this round's
# snapshot lands, driver coverage is 100% of the registry.  Remaining
# window slots re-verify earlier queries in module order (free
# regression signal, not wasted rows).
_MODULE_ORDER = (reference_queries, enterprise, advanced, llm_data, relational, tpch_extra)
_PROMOTED = (
    # queued since r5 — first driver look
    "events_robust_trend",
    "graph_bfs_hops",
    "events_ab_test_report",
    # new in r6 — first driver look
    "dedup_containment",
    "events_changepoint_binseg",
    "events_attribution_last_touch",
    "events_dau_mau_stickiness",
    "rollup_incremental_merge",
    "parts_pareto_abc",
    "corpus_perplexity_buckets",
    "dedup_minhash_estimate_audit",
    "events_user_gini",
    "text_rake_keywords",
    "embedding_gram_matrix",
    "events_cep_strict_sequence",
    "events_cep_followed_by",
    "events_run_lengths",
    "corpus_token_budget_select",
    "corpus_shard_assignment",
    "graph_kcore_trade",
    "corpus_classifier_auc",
    "join_view_incremental_merge",
    "bloom_join_prune_audit",
    "events_watermark_lateness_audit",
    "sketch_hll_sliding_users",
    "embedding_power_iteration",
    "events_cep_not_followed_by",
    "events_user_entropy_segments",
    "orders_benford_audit",
    "events_peak_concurrency",
    "multimodal_audio_quiet_segments",
    "dedup_lsh_candidate_audit",
    "text_zipf_fit_audit",
    "text_language_confusion",
    "corpus_ngram_novelty",
    "multimodal_image_dhash",
    "supplier_mad_outliers",
    "dedup_minhash_band_sweep",
    "multimodal_video_shot_segments",
    "events_seasonality_acf",
    "text_code_detection",
    "graph_degree_assortativity",
    "events_churn_cohorts",
    "events_ab_srm_check",
    "text_bpe_fertility",
    "cdc_merge_apply",
    "embedding_matryoshka_overlap",
    "text_pmi_collocations",
    "text_feature_hashing_audit",
    "graph_supplier_jaccard",
)

# r7 PROMOTION QUEUE (window was full when these landed; replace
# _PROMOTED with exactly this list at the START of round 7 — 30 names,
# leaving 20 slots for r7-new queries):
# corpus_classifier_calibration dedup_source_flow_matrix
# embedding_bitq_hamming_recall embedding_ivf_nprobe_sweep
# embedding_label_confusion embedding_ood_outliers
# embedding_random_projection_audit events_attribution_linear
# events_attribution_markov_removal events_cohort_ltv_curve
# events_interarrival_profile events_kaplan_meier_retention
# events_ks_drift_test events_l_diversity events_seasonal_decompose
# events_session_threshold_sweep events_velocity_flags
# events_wilson_ctr_rank fk_integrity_audit graph_clustering_coefficient
# graph_components_knn nation_revenue_hhi orders_basket_rules
# orders_fulfillment_latency part_price_anova_by_brand reco_item_cf_topk
# retrieval_ndcg_audit schema_fd_audit text_trigram_index_audit
# unpivot_user_event_matrix
# -- added later in r6 (append-as-built):
# text_textrank_keywords graph_hits_trade events_cuped_adjustment
# multimodal_image_phash dedup_simhash_clusters events_power_mde
# (derivation: registry minus union(CORRECTNESS_r01..r05) minus current
# _PROMOTED; anything added later in r6 appends here too)


def _ordered(attr):
    merged = {}
    for m in _MODULE_ORDER:
        merged.update(getattr(m, attr))
    out = {}
    for name in _PROMOTED:  # global promotion: cross-module, _PROMOTED order
        if name in merged:
            out[name] = merged[name]
    out.update(merged)
    return out


def all_queries():
    return _ordered("QUERIES")


def all_oracles():
    return _ordered("ORACLES")
