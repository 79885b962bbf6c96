"""The driver's correctness gate checks the FIRST 50 registered queries.
These tests pin the ROUND-9 rotated window (r8 VERDICT #1): 3 veterans
(the q1 flagship + the connector as permanent anchors, plus
approx_aggregates whose only driver rows predate its r7 error-bound
oracle) + 47 queries that had never produced a driver-side green row,
while the window still spans SURVEY.md §2 — every declared operator
family and §2.C class has an in-window rep or a documented evicted
veteran with a green driver row in the trailing rounds that stays
hash-checked in the in-repo replica. The §2.B Q-* skeleton is all
driver-green in r7/r8 (trailing <= 2); per the trailing-3-rounds
cadence (r8 VERDICT #7) the eleven r7-green Q-* must rotate back into
the ROUND-10 window — recorded below in FS_DUE_R10."""

from __future__ import annotations

import json
from pathlib import Path

from snackfs_spark.registry import PRIORITY, load_all

WINDOW = 50

# Queries with a driver-side green row in any round BEFORE the current
# one — the rotation's freshness denominator. The CURRENT window's own
# artifact (the driver writes it the moment the window runs) must be
# excluded, else every slot looks stale the round after it passes (r7
# VERDICT #1). Positional exclusion ("drop the highest-numbered file")
# was wrong the round AFTER a rotation: it also dropped the previous
# round's artifact, erasing exactly the trailing-green evidence the
# span policy leans on. Exclude SEMANTICALLY instead: an artifact is
# "this window's own run" iff most of its keys are the current
# PRIORITY names — prior-round artifacts of a rotated window overlap
# only on the few kept veterans.
_REPO = Path(__file__).resolve().parent.parent
_ARTIFACTS = sorted(
    _REPO.glob("CORRECTNESS_r*.json"),
    key=lambda p: int("".join(c for c in p.stem if c.isdigit()) or 0),
)
DRIVER_CHECKED = set()
for _p in _ARTIFACTS:
    try:
        _keys = set(json.loads(_p.read_text()).keys())
    except ValueError:
        continue
    if _keys and len(_keys & set(PRIORITY)) / len(_keys) > 0.5:
        continue  # the current window's own artifact
    DRIVER_CHECKED.update(_keys)

# Q-* → query name (SURVEY §2.B, 17 targets). NONE are in the r9
# window: all 17 are driver-green in r7 or r8 (trailing <= 2 rounds)
# and every slot they'd occupy went to the never-checked backlog
# instead (r8 VERDICT #1: drain hard). The eleven r7-green rows reach
# the trailing-3 cadence boundary after r9, so they are DUE in the
# ROUND-10 window (r8 VERDICT #7).
FS_DUE_R10 = {
    "Q-STAT": "fs_stat",
    "Q-LS": "fs_ls",
    "Q-DU": "fs_du",
    "Q-COUNT": "fs_count",
    "Q-LEN": "fs_len_from_blocks",
    "Q-BLOCKLOC": "fs_block_locations",
    "Q-CONTENT": "fs_content",
    "Q-MERGE": "fs_getmerge",
    "Q-RENAME": "fs_rename",
    "Q-DELETE": "fs_delete",
    "Q-MKDIR": "fs_mkdirs",
}
FS_R8_GREEN = {
    "Q-LSR": "fs_lsr",
    "Q-DUS": "fs_dus",
    "Q-SUBOFF": "fs_suboff_prefix_sum",
    "Q-LOCK": "fs_lock_arbitration",
    "Q-RANGE": "fs_range_read",
    "Q-TAIL": "fs_tail",
}

# family → representative query INSIDE the r9 window.
FAMILIES = {
    # q1 stays as the filter+agg anchor (sf1-verified decimal lattice)
    "filter/projection + group agg": "q1_pricing_summary",
    # 8-table join with market-share ratio; q9/q15 are r8-green
    "equi-join + agg": "q8_market_share",
    "broadcast dims": "q8_market_share",
    # EXISTS order-priority count; q21/rel_semi_anti are r7/r8-green
    "multi-join exists/not-exists": "q4_priority_exists",
    # running-sum + running-max windows on the excess-revenue curve
    "running sum window": "orders_max_drawdown",
    "sort+limit / top-k": "text_vocab_topk",
    # correlated scalar subqueries: per-group min and half-avg forms
    "correlated scalar subquery": "rel_min_per_group_subquery",
    "correlated threshold subquery": "q20_bulk_suppliers",
    "function battery": "dq_check_battery",
}
# family → evicted veteran with a TRAILING driver-green row (r7/r8),
# still hash-checked by the in-repo replica every test run.
FAMILIES_TRAILING = {
    "non-equi join (band/interval)": "fs_range_read",  # r8
    "as-of / point-in-time join": "pit_feature_join",  # r8
    "window ranking": "win_first_order_per_customer",  # r8
    "rollup/cube/groupingsets": "events_markov_transitions",  # r8
    "unpivot / reshape": "unpivot_part_measures",  # r8
    "disjunctive pushdown": "q19_disjunctive_filter",  # r8
    "set operations": "setops_all_variants",  # r7
    "skewed join salting": "rel_salted_skew_join",  # r7
}

# §2.C class → representative inside the r9 window
CLASSES = {
    "dedup (verified cosine pairs)": "dedup_tf_cosine",
    "dedup (chunk exact)": "dedup_chunk_exact",
    "dedup (asymmetric containment)": "dedup_containment",
    "dedup (golden record)": "dedup_golden_record",
    "similarity (LSH recall eval)": "ann_lsh_recall",
    "similarity (int8 quantization)": "embedding_quantize_int8",
    "retrieval (inverted index)": "text_inverted_index",
    "retrieval eval (NDCG@k)": "eval_ndcg_at_k",
    "multimodal (audio decode)": "multimodal_audio_resample",
    "multimodal (image decode)": "multimodal_brightness_drift",
    "sampling (stratified)": "stratified_sample",
    "sampling (mixture weights)": "mixture_sample",
    "splits (token accounting)": "split_summary_tokens",
    "chunking / packing": "text_chunk_sliding",
    "source formats (JSONL)": "corpus_jsonl_roundtrip",
    "source formats (CSV)": "corpus_csv_roundtrip",
    "streaming (CDC upsert)": "streaming_cdc_upsert",
    "streaming (tail follow)": "streaming_tail_follow",
    "connector": "fs_connector_roundtrip",
    "cohort LTV": "orders_cohort_ltv",
    "forecasting (seasonal-naive MASE)": "orders_seasonal_naive_mase",
    "causal readout (Mann-Whitney)": "sample_mann_whitney_u",
    "causal readout (two-sample KS)": "sample_ks_two_sample",
    "mergeable sketches (HLL overlap)": "approx_overlap_hll",
    "mergeable sketches (error bounds)": "approx_aggregates",
    "graph (triangles)": "graph_triangle_count",
    "graph (BFS frontier)": "graph_bfs_hops",
    "frequent-pattern mining": "mining_association_rules",
    "privacy": "privacy_l_diversity",
    "eval (isotonic calibration)": "eval_isotonic_calibration",
    "fs analytics (SCD2 history)": "fs_scd2_history",
    "fs analytics (text decode)": "fs_text_decode",
}
# §2.C class → trailing driver-green veteran (r7/r8)
CLASSES_TRAILING = {
    "dedup (signature banding)": "dedup_simhash_pairs",  # r8
    "dedup (entity resolution)": "dedup_entity_snm",  # r8
    "similarity (IVF pruned)": "ann_ivf_multiprobe",  # r8
    "similarity (diversity re-rank)": "retrieval_mmr_topk",  # r8
    "retrieval (hybrid fusion)": "hybrid_search_topk",  # r8
    "retrieval (boolean)": "retrieval_boolean_query",  # r8
    "funnel": "events_conversion_funnel",  # r8
    "cohort retention": "events_cohort_retention",  # r8
    "attribution": "events_attribution",  # r8
    "survival analysis": "events_survival_km",  # r8
    "corpus lifecycle (takedown)": "corpus_takedown_audit",  # r8
    "source formats (ORC)": "corpus_orc_roundtrip",  # r8
    "packing (length buckets)": "pack_length_buckets",  # r8
    "streaming (chained stateful)": "streaming_windowed_peak",  # r8
    "graph (fixpoint)": "graph_pagerank_tokens",  # r8
    "graph (communities)": "graph_label_propagation",  # r8
    "eval (calibration ECE)": "eval_calibration_ece",  # r8
    "privacy (k-anonymity)": "privacy_k_anonymity",  # r8
}

# Evicted veterans that must STAY registered + oracled (repo replica
# keeps hash-checking them every test run). The r8 window's 42
# first-time names all carry trailing-1 driver-green rows; the r7-era
# and earlier veterans carry older green rows.
EVICTED_STAY_ORACLED = [
    # r8 window, all green in CORRECTNESS_r08
    "fs_lsr",
    "fs_dus",
    "fs_suboff_prefix_sum",
    "fs_lock_arbitration",
    "fs_range_read",
    "fs_tail",
    "fs_count_quota",
    "fs_permission_audit",
    "fs_namespace_profile",
    "fs_replica_sets",
    "q9_product_profit",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_filter",
    "rel_semi_anti_joins",
    "unpivot_part_measures",
    "quantile_battery",
    "win_first_order_per_customer",
    "events_conversion_funnel",
    "events_cohort_retention",
    "events_attribution",
    "events_survival_km",
    "orders_holt_linear_forecast",
    "events_two_proportion_test",
    "pit_feature_join",
    "events_markov_transitions",
    "graph_pagerank_tokens",
    "graph_label_propagation",
    "dedup_simhash_pairs",
    "dedup_entity_snm",
    "ann_ivf_multiprobe",
    "retrieval_mmr_topk",
    "text_tfidf_topk",
    "hybrid_search_topk",
    "retrieval_boolean_query",
    "multimodal_audio_vad",
    "multimodal_image_tiles",
    "split_temporal_holdout",
    "importance_sample_dsir",
    "sample_coreset_kcenter",
    "pack_length_buckets",
    "corpus_orc_roundtrip",
    "corpus_takedown_audit",
    "eval_calibration_ece",
    "privacy_k_anonymity",
    "streaming_windowed_peak",
    "streaming_dedup_ingest",
    "approx_distinct_hll_merged",
    # r7 window veterans (green in CORRECTNESS_r07)
    "fs_stat",
    "fs_ls",
    "fs_du",
    "fs_count",
    "fs_len_from_blocks",
    "fs_block_locations",
    "fs_content",
    "fs_getmerge",
    "fs_rename",
    "fs_delete",
    "fs_mkdirs",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "q2_min_cost_supplier",
    "setops_all_variants",
    "q21_straggler_suppliers",
    "rel_salted_skew_join",
    "sessionize_events",
    "asof_last_error_before_purchase",
    "events_gap_fill",
    "events_diff_in_diff",
    "heavy_hitters_countmin",
    "graph_kcore_decomposition",
    "stats_moments_battery",
    "basket_pairs_pcy",
    "cube_order_priorities",
    "privacy_t_closeness",
    "orders_pareto_abc",
    "win_trailing_30d_revenue",
    "eval_conformal_threshold",
    "dedup_semantic",
    "text_kneser_ney_bigram",
    "text_lang_id",
    "text_quality_score",
    "text_bm25_topk",
    "split_semantic_contamination",
    "emb_pca_power_iteration",
    "emb_kmeans_elbow",
    "ann_pq_adc",
    "emb_random_projection",
    "dedup_lsh_tuning",
    "sample_reservoir_priority",
    "split_exact_stratified",
    "pack_sequences",
    "multimodal_scene_cuts",
    "multimodal_phash_dedup",
    "streaming_session_windows",
    "corpus_build_train",
    # older evicted veterans (r1-r6 green rows)
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q6_revenue_forecast",
    "fs_fsck",
    "dedup_prefix_filter",
    "dedup_span_ngrams",
    "layout_zorder_skipping",
    "bpe_learn_merges",
    "events_quantiles_binned",
    "corpus_merge_upsert",
    "text_perplexity_buckets",
    "events_cusum_changepoint",
    "setops_customer_years",
    "rollup_pricing",
    "approx_distinct_hll",
    "scalar_function_battery",
    "win_sliding_distinct_users",
    "rel_bloom_runtime_filter",
    "dedup_winnow_fingerprint",
    "eval_quality_auc",
    "dedup_semantic_scaled",
    "dedup_entity_resolution",
    "corpus_pareto_front",
    "split_cluster_safe",
    "text_profile",
    "multimodal_audio_energy",
    "corpus_build_v2",
    "split_contamination_check",
    "streaming_hourly_rollup",
]


def test_priority_fits_window():
    assert len(PRIORITY) == WINDOW
    assert len(set(PRIORITY)) == len(PRIORITY)


def test_window_order_and_span():
    reg = load_all()
    names = list(reg)
    window = set(names[:WINDOW])
    # load_all puts PRIORITY first, verbatim
    assert names[: len(PRIORITY)] == list(PRIORITY)
    for target, q in {**FAMILIES, **CLASSES}.items():
        assert q in window, f"{target} ({q}) fell outside the driver's window"


def test_trailing_reps_are_driver_green():
    """Families/classes without an in-window rep must be covered by an
    evicted veteran with a PRIOR driver-green row (the replica keeps
    hash-checking them every run)."""
    for target, q in {**FAMILIES_TRAILING, **CLASSES_TRAILING}.items():
        assert q in DRIVER_CHECKED, (
            f"{target} ({q}) has neither an in-window rep nor a prior"
            " driver-green row"
        )


def test_fs_skeleton_trailing_cadence():
    """Every §2.B Q-* target is either in the current window or has a
    driver-green row in the trailing rounds (r7 VERDICT #7). The
    FS_DUE_R10 names reach the cadence boundary after this round and
    must be rotated into the round-10 window."""
    for target, q in {**FS_DUE_R10, **FS_R8_GREEN}.items():
        assert q in DRIVER_CHECKED, (
            f"{target} ({q}) rotated out without a prior driver-green row"
        )


def test_rotation_freshness():
    """≥35/50 window slots must be first-time driver rows while the
    never-checked backlog exceeds 100 (r7 VERDICT #3). Skipped-degrade:
    if no prior CORRECTNESS artifacts exist (fresh clone),
    DRIVER_CHECKED is empty and every slot counts as fresh."""
    fresh = [n for n in PRIORITY if n not in DRIVER_CHECKED]
    assert len(fresh) >= 35, (
        f"only {len(fresh)}/{WINDOW} window slots are first-time driver rows"
    )


def test_evicted_veterans_stay_oracled():
    reg = load_all()
    veterans = (
        EVICTED_STAY_ORACLED
        + list(FS_DUE_R10.values())
        + list(FS_R8_GREEN.values())
        + list(FAMILIES_TRAILING.values())
        + list(CLASSES_TRAILING.values())
    )
    for name in veterans:
        assert name in reg, f"evicted veteran {name} fell out of the registry"
        assert reg[name].oracle is not None, f"{name} lost its oracle"


def test_window_is_oracle_checked():
    """EVERYTHING in the window is hash-checked."""
    reg = load_all()
    for name in list(reg)[:WINDOW]:
        assert reg[name].oracle is not None, f"{name} has no oracle in the window"


def test_registry_fully_oracled():
    """r7 VERDICT #5: zero un-oracled queries — approx_aggregates got
    an error-bound oracle, so every registered query is hash-checked."""
    reg = load_all()
    unoracled = [n for n, q in reg.items() if q.oracle is None]
    assert unoracled == [], f"un-oracled queries: {unoracled}"
