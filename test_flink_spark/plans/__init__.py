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
# Window accounting for THIS round (r7): union(CORRECTNESS_r01..r06)
# covers 220 of 256 — the 36 below are everything registered after the
# r6 window filled.  Once this round's snapshot lands, driver coverage is
# 100% of the r6 registry; r7-new queries append after these 36 (14 free
# slots).  tests/test_plans.py::test_promotion_window_covers_registry
# enforces this invariant at commit time.
_MODULE_ORDER = (reference_queries, enterprise, advanced, llm_data, relational, tpch_extra)
_PROMOTED = (
    # r7 queue: everything registered in r6 after the window filled —
    # registry minus union(CORRECTNESS_r01..r06); 36 names, 14 free slots.
    "events_wilson_ctr_rank",
    "events_attribution_linear",
    "events_kaplan_meier_retention",
    "events_cohort_ltv_curve",
    "events_ks_drift_test",
    "events_session_threshold_sweep",
    "events_velocity_flags",
    "graph_clustering_coefficient",
    "reco_item_cf_topk",
    "events_interarrival_profile",
    "events_attribution_markov_removal",
    "graph_components_knn",
    "events_cuped_adjustment",
    "events_power_mde",
    "nation_revenue_hhi",
    "part_price_anova_by_brand",
    "orders_basket_rules",
    "fk_integrity_audit",
    "events_seasonal_decompose",
    "events_l_diversity",
    "schema_fd_audit",
    "orders_fulfillment_latency",
    "graph_hits_trade",
    "embedding_bitq_hamming_recall",
    "retrieval_ndcg_audit",
    "text_trigram_index_audit",
    "embedding_label_confusion",
    "embedding_ivf_nprobe_sweep",
    "embedding_ood_outliers",
    "corpus_classifier_calibration",
    "embedding_random_projection_audit",
    "dedup_source_flow_matrix",
    "text_textrank_keywords",
    "multimodal_image_phash",
    "dedup_simhash_clusters",
    "unpivot_user_event_matrix",
    # new in r7 — first driver look
    "dedup_simhash_clusters_w64",
    "dedup_simhash_band_occupancy",
    "dedup_clusters_incremental",
    "events_cep_within",
    "embedding_ivfpq_ann",
    "embedding_pq_distortion_audit",
    "corpus_dedup_cascade_audit",
    "embedding_near_dup_lsh_scaled",
    "embedding_ivfpq_refine_sweep",
    "graph_ppr_suppliers",
    "events_cep_branching",
    "dedup_detector_agreement",
)



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
