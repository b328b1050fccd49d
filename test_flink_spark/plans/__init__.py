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
    # (r12 prune, r11 verdict item 8: the r8/r10 swap entries —
    # dedup_simhash_clusters r8, embedding_near_dup_lsh r8,
    # grouping_sets_orders r10, graph_degree_assortativity r11 — all
    # re-verified at or after their swap rounds, so per the rule above
    # they were no-ops and are removed.)
    #
    # r12 cap rollout (r11 verdict items 1+3): the n-gram pair-generation
    # class (ngram_jaccard_pairs / containment_pairs / duplicate_clusters
    # / _shared_pair_base) now defaults to the max_doc_freq=256
    # stop-shingle cap — the 100 TB geometry (a shingle in f docs costs
    # f^2 join pairs; the r11 sf10 probe killed the uncapped form).  The
    # FIVE names below are this round's in-window swaps and their old
    # certificates are voided.  The other consumers of the same builders
    # are NOT voided, on measured grounds: the cap cannot bind at any
    # certified scale (max shingle doc-freq: sf0.01 = 7, sf0.1 = 25,
    # sf1 = 135 < 256), so capped output is bit-identical to every
    # attested run — a plan-only change at those scales, re-checked
    # locally via tools/check_oracle.py for every affected name (see
    # BASELINE.md r12 notes) and re-certified by the normal rotation
    # (the r7 cohort, incl. corpus_dedup_cascade_audit and
    # dedup_detector_agreement, is forced into the r13 window).
    "dedup_clusters_incremental": 12,
    "dedup_containment": 12,
    "dedup_lsh_candidate_audit": 12,
    "dedup_minhash_band_sweep": 12,
    "dedup_minhash_estimate_audit": 12,
}

_PROMOTED = (
    # r12 rotation window: verified-age rotation (tools/verified_age.py).
    # 49 forced names — the cohort last driver-verified in r6 (6 rounds
    # stale at r12 open, forced by test_promotion_window_rotates_stalest
    # at MAX_AGE=6) — plus ONE free slot spent on dedup_clusters_incremental:
    # the r11-verdict sf10-CONFIRMED scale failure, swapped this round to
    # the max_doc_freq-capped pair geometry (certificate voided by
    # _REVERIFY, forced; see the cap-rollout note on _REVERIFY).  Four of
    # the forced r6 names (dedup_containment, dedup_lsh_candidate_audit,
    # dedup_minhash_band_sweep, dedup_minhash_estimate_audit) are ALSO
    # cap-swapped this round — their re-certification rides the forced
    # rotation at zero slot cost.  49 + 1 = 50: no other additions; the
    # registry-debt rotation (r7 cohort, 47 names) clears r13 with 3 free
    # slots reserved for prompt post-cap re-certification of the three
    # flipped-but-not-voided fresh-cert names (dedup_ngram_jaccard,
    # corpus_split_leakage, dedup_cross_lingual — see _REVERIFY note).
    # Regenerate with: python tools/verified_age.py --fill N
    # --- r11 implementation swap (certificate voided, forced) ---
    "dedup_clusters_incremental",
    # --- last verified r6 (forced cohort) ---
    "bloom_join_prune_audit",
    "cdc_merge_apply",
    "corpus_classifier_auc",
    "corpus_ngram_novelty",
    "corpus_perplexity_buckets",
    "corpus_shard_assignment",
    "corpus_token_budget_select",
    "dedup_containment",
    "dedup_lsh_candidate_audit",
    "dedup_minhash_band_sweep",
    "dedup_minhash_estimate_audit",
    "embedding_gram_matrix",
    "embedding_matryoshka_overlap",
    "embedding_power_iteration",
    "events_ab_srm_check",
    "events_ab_test_report",
    "events_attribution_last_touch",
    "events_cep_followed_by",
    "events_cep_not_followed_by",
    "events_cep_strict_sequence",
    "events_changepoint_binseg",
    "events_churn_cohorts",
    "events_dau_mau_stickiness",
    "events_peak_concurrency",
    "events_robust_trend",
    "events_run_lengths",
    "events_seasonality_acf",
    "events_user_entropy_segments",
    "events_user_gini",
    "events_watermark_lateness_audit",
    "graph_bfs_hops",
    "graph_kcore_trade",
    "graph_supplier_jaccard",
    "join_view_incremental_merge",
    "multimodal_audio_quiet_segments",
    "multimodal_image_dhash",
    "multimodal_video_shot_segments",
    "orders_benford_audit",
    "parts_pareto_abc",
    "rollup_incremental_merge",
    "sketch_hll_sliding_users",
    "supplier_mad_outliers",
    "text_bpe_fertility",
    "text_code_detection",
    "text_feature_hashing_audit",
    "text_language_confusion",
    "text_pmi_collocations",
    "text_rake_keywords",
    "text_zipf_fit_audit",
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
