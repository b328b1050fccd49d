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
    # r10: ROUND(SUM(double)) -> exact integer cents after the sf1 hash
    # check caught cross-engine double-sum drift on the () grouping set
    "grouping_sets_orders": 10,
    # r10: Decimal(38,0) cross-product finish -> quantized python-bigint
    # scalar finish (semantics shift at floor boundaries / sub-1e6
    # variances); its only driver row predates the swap (r6), so the
    # certificate attests the retired algorithm (r10 ADVICE)
    "graph_degree_assortativity": 10,
}

_PROMOTED = (
    # r11 rotation window: verified-age rotation (tools/verified_age.py).
    # The window is exactly consumed by forced names this round — the
    # 49-query cohort last driver-verified in r5 (6 rounds stale at r11
    # open, forced by test_promotion_window_rotates_stalest at MAX_AGE=6)
    # plus the r10 implementation swap of graph_degree_assortativity
    # (certificate voided by _REVERIFY, forced).  49 + 1 = 50: ZERO slots
    # for new queries, which is why r11 adds none (the registry debt from
    # the 295-query build-out clears through r12; first free slots r13).
    # Regenerate with: python tools/verified_age.py --fill N
    # --- r10 implementation swap (certificate voided, forced) ---
    "graph_degree_assortativity",
    # --- last verified r5 (forced cohort) ---
    "cdc_point_in_time_join",
    "cohort_retention",
    "corpus_dsir_weights",
    "corpus_epoch_mix",
    "corpus_multimodal_dup_flags",
    "corpus_quality_classifier",
    "corpus_span_dedup",
    "corpus_split_leakage",
    "corpus_stratified_sample",
    "corpus_vocab_coverage",
    "dedup_cross_lingual",
    "dedup_keep_best",
    "embedding_ann_recall",
    "embedding_cluster_purity",
    "embedding_hybrid_rrf",
    "embedding_ivfadc_ann",
    "embedding_lsh_ann",
    "embedding_quantize_error",
    "events_lttb_downsample",
    "events_ohlc_bars",
    "events_time_weighted_avg",
    "funnel_view_click_purchase",
    "json_malformed_audit",
    "lateral_top_orders_per_customer",
    "multimodal_audio_fingerprint",
    "multimodal_decode_features",
    "multimodal_image_ahash",
    "multimodal_image_resize_stats",
    "multimodal_video_frame_jaccard",
    "parts_price_size_skyline",
    "pattern_view_then_click",
    "percentile_value_by_type",
    "q11_important_stock",
    "q12_ship_delay_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_count",
    "q19_disjunctive_revenue",
    "q20_part_promotion",
    "q21_late_suppliers",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "text_bm25_topk",
    "text_gopher_rules",
    "text_lm_surprisal",
    "text_winnowing_fingerprints",
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
