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
_PROMOTED = (
    # r8 rotation window (r7 verdict item 2): verified-age rotation.
    # New r8 queries lead (first driver look), then the 29 queries last
    # driver-verified in r2 (forced by test_promotion_window_rotates_stalest
    # at MAX_AGE=6), then the oldest of the r3 cohort as fill.
    # Regenerate with: python tools/verified_age.py --fill N
    # --- new in r8 (first driver look) ---
    "embedding_ivfpq_sampled_train",
    "corpus_dup_substrings",
    "corpus_dup_span_coverage",
    "embedding_ivf_balance_audit",
    "corpus_dedup_verdicts",
    # --- last verified r2 (forced) ---
    "asof_join_last_error",
    "asof_join_next_error",
    "asof_join_with_tolerance",
    "banded_proximity_counts",
    "count_distinct_exact",
    "cube_lineitem",
    "date_functions_sweep",
    "distinct_user_event_pairs",
    "except_users_without_errors",
    "first_event_per_user_day",
    "full_outer_join_balances",
    "grouping_sets_orders",
    "hourly_unique_users",
    "intersect_view_and_purchase_users",
    "ntile_price_quartiles",
    "pivot_event_counts",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q22_idle_customers",
    "q4_order_priority",
    "q6_forecast_revenue",
    "range_join_ship_window",
    "rollup_lineitem",
    "salted_skew_aggregate",
    "scalar_functions_sweep",
    "union_all_account_balances",
    "union_distinct_users",
    "window_order_analytics",
    # --- last verified r3 (fill; trim from the END for new-r8 slots) ---
    "anti_join_customers_no_orders",
    "broadcast_join_parts",
    "bucketed_join_revenue",
    "corpus_build_dataset",
    "corpus_curation_pipeline",
    "corpus_curation_strict",
    "corpus_decontaminate",
    "corpus_length_histogram",
    "corpus_mix_report",
    "corpus_pii_redaction",
    "corpus_temperature_mix",
    "corpus_train_split",
    "dedup_clusters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
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
