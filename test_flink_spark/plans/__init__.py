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
# Window accounting for THIS round (r8): union(CORRECTNESS_r01..r07)
# covers the whole r7 registry, so the window's job changed from closing
# coverage debt to ROTATING stale certificates (r7 verdict item 2): new
# queries lead, then the stalest cohort oldest-first
# (tools/verified_age.py).  Two gates enforce it at commit time:
# tests/test_plans.py::test_promotion_window_covers_registry (no query
# outside union+window) and ::test_promotion_window_rotates_stalest
# (nothing unverified for >= 6 rounds stays out of the window).
_MODULE_ORDER = (reference_queries, enterprise, advanced, llm_data, relational, tpch_extra)

# Query name -> round its implementation was SWAPPED under the same name
# (r8 ADVICE): driver certificates from earlier rounds attest the retired
# algorithm, so tools/verified_age.py voids them and the rotation gate
# forces the name back into the window until a post-swap certificate
# lands.  Entries become no-ops (and can be pruned) once last-verified
# >= swap round.
_REVERIFY = {
    "dedup_simhash_clusters": 8,   # r8: w32 -> w64 / 16-bit-band rewrite
    "embedding_near_dup_lsh": 8,   # r8: fixed-6-plane -> corpus-adaptive
}

_PROMOTED = (
    # r9 rotation window: verified-age rotation (tools/verified_age.py).
    # New r9 queries lead (first driver look), then the two r8
    # implementation swaps whose pre-swap certificates are void
    # (_REVERIFY), then the 25 queries last driver-verified in r3 (forced
    # by test_promotion_window_rotates_stalest at MAX_AGE=6), then the
    # oldest of the r4 cohort as fill (trim from the END for new-r9 slots).
    # Regenerate with: python tools/verified_age.py --fill N
    # --- new in r9 (first driver look) ---
    "shuffle_partition_advisor",
    "stats_merge_rollup",
    "events_dynamic_session_windows",
    "events_count_windows",
    "broadcast_plan_advisor",
    "collect_table_stats",
    "gdpr_erasure_audit",
    "join_order_advisor",
    "agg_reduction_advisor",
    "join_cardinality_estimate",
    "layout_compaction_planner",
    "corpus_curriculum_order",
    "corpus_cluster_sharding",
    "embedding_ivfpq_sampled_search",
    "events_cep_within_flink",
    "dedup_cluster_quality",
    "corpus_verdict_effects",
    "embedding_filtered_ann",
    "doc_pack_efficiency",
    "embedding_dim_variance_audit",
    "embedding_filtered_ann_recall",
    "corpus_dedup_threshold_sensitivity",
    "corpus_source_contamination_matrix",
    # --- r8 implementation swaps (certificates voided, forced) ---
    "dedup_simhash_clusters",
    "embedding_near_dup_lsh",
    # --- last verified r3 (forced) ---
    "dedup_simhash",
    "doc_block_dedup",
    "doc_chunk_token_windows",
    "doc_pack_assignments",
    "embedding_cosine_topk",
    "embedding_ivf_ann",
    "embedding_near_dup",
    "embedding_semdedup",
    "json_props_aggregate",
    "knn_label_vote",
    "multimodal_chunk_fingerprints",
    "multimodal_frame_sample",
    "multimodal_media_stats",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "semi_join_big_lineitems",
    "text_fingerprint",
    "text_language_id",
    "text_quality_scores",
    "text_repetition_scores",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_top_bigrams",
    # --- last verified r4 (fill; trim from the END for new-r9 slots) ---
    "avg_value_by_type",
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
