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
}

_PROMOTED = (
    # r10 rotation window: verified-age rotation (tools/verified_age.py).
    # New r10 queries lead (first driver look), then the FULL 47-query
    # cohort last driver-verified in r4 (5 rounds stale at r10 open — the
    # largest cohort, forced by test_promotion_window_rotates_stalest at
    # MAX_AGE=6), then the oldest of the r5 cohort as fill (trim from the
    # END for new-r10 slots).
    # Regenerate with: python tools/verified_age.py --fill N
    # --- new in r10 (first driver look) ---
    "events_processing_time_tumbling",
    # --- r10 implementation swap (certificates voided, forced) ---
    "grouping_sets_orders",
    # --- last verified r4 (forced cohort) ---
    "cdc_apply_latest",
    "cdc_scd2_history",
    "cdc_snapshot_diff",
    "corpus_domain_percentile_filter",
    "corpus_topic_labels",
    "corpus_weighted_sample",
    "csv_parse_roundtrip",
    "customers_rfm_segments",
    "data_quality_report",
    "dedup_incremental_shard",
    "embedding_split_drift",
    "events_cusum_drift",
    "events_daily_anomaly",
    "events_decayed_engagement",
    "events_double_exp_forecast",
    "events_forecast_backtest",
    "events_frequent_paths",
    "events_holt_winters",
    "events_hourly_gapfill",
    "events_item_cooccurrence",
    "events_k_anonymity",
    "events_markov_transitions",
    "events_trailing_7d",
    "filter_count_by_user",
    "funnel_latency_quantiles",
    "fuzzy_part_name_pairs",
    "graph_lpa_communities",
    "graph_pagerank_trade",
    "graph_triangle_counts",
    "json_parse_project",
    "layout_encoding_advisor",
    "layout_pruning_report",
    "layout_zorder_events",
    "rollup_multi_granularity",
    "session_stats_per_user",
    "session_window_count",
    "sketch_cms_heavy_hitters",
    "sketch_histogram_quantiles",
    "sketch_hll_distinct_users",
    "sketch_hll_merge_rollup",
    "sketch_kmv_distinct_users",
    "sketch_kmv_overlap",
    "skew_key_report",
    "text_bigram_surprisal",
    "text_bpe_encode",
    "text_bpe_merges",
    "text_sparse_cosine_topk",
    # --- last verified r5 (fill; trim from the END for new-r10 slots) ---
    "approx_aggregates",
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
