"""The driver's correctness gate checks the FIRST 50 registered queries.
These tests pin the ROUND-8 rotated window (r7 VERDICT #3/#7): 8
veterans (the six §2.B Q-* evicted since r4, on the trailing-3-rounds
cadence, plus the connector and q1) + 42 queries that had never
produced a driver-side green row, while the window still spans
SURVEY.md §2 — every declared operator family and §2.C class has an
in-window rep or a documented evicted veteran with a green driver row
in the trailing 3 rounds that stays hash-checked in the in-repo
replica."""

from __future__ import annotations

import json
from pathlib import Path

from snackfs_spark.registry import PRIORITY, load_all

WINDOW = 50

# Queries with a driver-side green row in any round BEFORE the current
# one — the rotation's freshness denominator. The highest-numbered
# CORRECTNESS file is the *current* window's own artifact (the driver
# writes it the moment the window runs), so including it would make
# every slot look stale the round after it passes (r7 VERDICT #1).
_REPO = Path(__file__).resolve().parent.parent
_ARTIFACTS = sorted(
    _REPO.glob("CORRECTNESS_r*.json"),
    key=lambda p: int("".join(c for c in p.stem if c.isdigit()) or 0),
)
DRIVER_CHECKED = set()
for _p in _ARTIFACTS[:-1]:  # exclude the current round's artifact
    try:
        DRIVER_CHECKED.update(json.loads(_p.read_text()).keys())
    except ValueError:
        pass

# Q-* → query name (SURVEY §2.B, 17 targets). The six in-window rows
# rotated back in this round after 3 rounds out (r7 VERDICT #7); the
# eleven evicted rows all have a green driver row in CORRECTNESS_r07
# (trailing-1) and stay hash-checked in the in-repo replica.
FS_IN_WINDOW = {
    "Q-LSR": "fs_lsr",
    "Q-DUS": "fs_dus",
    "Q-SUBOFF": "fs_suboff_prefix_sum",
    "Q-LOCK": "fs_lock_arbitration",
    "Q-RANGE": "fs_range_read",
    "Q-TAIL": "fs_tail",
}
FS_R7_GREEN = {
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

# family → representative query inside the window. Families whose r7
# rep rotated out keep coverage through a same-shape in-window rep; the
# r7 rep itself is trailing-1 driver-green.
FAMILIES = {
    # q1 stays as the filter+agg anchor (sf1-verified decimal lattice)
    "filter/projection + group agg": "q1_pricing_summary",
    # q2/q21 are r7-green; the 6-table profit join is the fresher rep
    "equi-join + agg": "q9_product_profit",
    "broadcast dims": "q9_product_profit",
    "multi-join exists/not-exists": "rel_semi_anti_joins",
    # rel_salted_skew_join is r7-green (trailing-1); the skew posture
    # stays plan-pinned in tests/test_plans.py
    "non-equi join (band/interval)": "fs_range_read",
    "as-of / point-in-time join": "pit_feature_join",
    "window ranking": "win_first_order_per_customer",
    "running sum window": "fs_suboff_prefix_sum",
    "sort+limit / top-k": "text_tfidf_topk",
    # setops_all_variants r7-green; snapshot-diff EXCEPT shapes stay
    # repo-oracle. Rollup/cube rotates to the grouping-sets Markov cube
    # (cube_order_priorities r7-green)
    "rollup/cube/groupingsets": "events_markov_transitions",
    "function battery": "quantile_battery",
    "unpivot / reshape": "unpivot_part_measures",
    "disjunctive pushdown": "q19_disjunctive_filter",
    "correlated scalar subquery": "q17_small_quantity_revenue",
}

# §2.C class → representative inside the window
CLASSES = {
    "dedup (signature banding)": "dedup_simhash_pairs",
    "dedup (entity resolution)": "dedup_entity_snm",
    "similarity (IVF pruned)": "ann_ivf_multiprobe",
    "similarity (diversity re-rank)": "retrieval_mmr_topk",
    "retrieval (lexical ranking)": "text_tfidf_topk",
    "retrieval (hybrid fusion)": "hybrid_search_topk",
    "retrieval (boolean)": "retrieval_boolean_query",
    "multimodal (audio decode)": "multimodal_audio_vad",
    "multimodal (image decode)": "multimodal_image_tiles",
    "sampling (importance/DSIR)": "importance_sample_dsir",
    "sampling (coreset)": "sample_coreset_kcenter",
    "splits (temporal)": "split_temporal_holdout",
    "packing": "pack_length_buckets",
    "source formats (ORC)": "corpus_orc_roundtrip",
    "corpus lifecycle (takedown)": "corpus_takedown_audit",
    "streaming (chained stateful)": "streaming_windowed_peak",
    "streaming (dedup ingest)": "streaming_dedup_ingest",
    "connector": "fs_connector_roundtrip",
    "funnel": "events_conversion_funnel",
    "cohort retention": "events_cohort_retention",
    "attribution": "events_attribution",
    "survival analysis": "events_survival_km",
    "forecasting": "orders_holt_linear_forecast",
    "causal readout (A/B test)": "events_two_proportion_test",
    "mergeable sketches (HLL merge)": "approx_distinct_hll_merged",
    "graph (fixpoint)": "graph_pagerank_tokens",
    "graph (communities)": "graph_label_propagation",
    "privacy": "privacy_k_anonymity",
    "eval (calibration)": "eval_calibration_ece",
    "fs analytics (audit/profile)": "fs_permission_audit",
}

# Evicted veterans that must STAY registered + oracled (repo replica
# keeps hash-checking them every test run). The r7 window's 42 evicted
# names all carry trailing-1 driver-green rows.
EVICTED_STAY_ORACLED = [
    # r7 window, all green in CORRECTNESS_r07
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
    for target, q in {**FS_IN_WINDOW, **FAMILIES, **CLASSES}.items():
        assert q in window, f"{target} ({q}) fell outside the driver's window"


def test_fs_skeleton_trailing_cadence():
    """Every §2.B Q-* target is either in the current window or has a
    driver-green row in the trailing rounds (r7 VERDICT #7)."""
    for target, q in FS_R7_GREEN.items():
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
    for name in EVICTED_STAY_ORACLED + list(FS_R7_GREEN.values()):
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
