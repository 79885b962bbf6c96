"""The driver's correctness gate checks the FIRST 50 registered queries.
These tests pin the ROUND-7 rotated window (r6 VERDICT #1): 15 veterans
+ 35 queries that had never produced a driver-side green row, while the
window still spans SURVEY.md §2 — the fs skeleton crew, every declared
operator family (in-window rep or a documented evicted veteran that
stays hash-checked in the in-repo replica), and every §2.C class."""

from __future__ import annotations

import json
from pathlib import Path

from snackfs_spark.registry import PRIORITY, load_all

WINDOW = 50

# Queries with a driver-side green row in ANY prior round's
# CORRECTNESS_r*.json (r1-r6) — the rotation's freshness denominator.
_REPO = Path(__file__).resolve().parent.parent
DRIVER_CHECKED = set()
for _p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
    try:
        DRIVER_CHECKED.update(json.loads(_p.read_text()).keys())
    except ValueError:
        pass

# Q-* → query name (SURVEY §2.B, 17 targets). In-window skeleton crew;
# the evicted 7 keep their oracle + in-repo replica coverage (each has
# 1-6 rounds of green driver rows on record).
FS_IN_WINDOW = {
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
FS_REPO_ORACLE = {
    "Q-LSR": "fs_lsr",
    "Q-DUS": "fs_dus",
    "Q-SUBOFF": "fs_suboff_prefix_sum",
    "Q-LOCK": "fs_lock_arbitration",
    "Q-RANGE": "fs_range_read",
    "Q-TAIL": "fs_tail",
}

# family → representative query inside the window
FAMILIES = {
    # q6/q3/q5 evicted with 6 green rounds each; the filter+agg shape is
    # q1, join+agg is q2/q21, broadcast dims is q2's region→nation→
    # supplier chain
    "filter/projection + group agg": "q1_pricing_summary",
    "equi-join + agg": "q2_min_cost_supplier",
    "broadcast dims": "q2_min_cost_supplier",
    "multi-join exists/not-exists": "q21_straggler_suppliers",
    "skew remedy (salted join)": "rel_salted_skew_join",
    "non-equi join": "fs_block_locations",
    "as-of join": "asof_last_error_before_purchase",
    "window ranking": "ann_bruteforce_topk",
    # fs_suboff_prefix_sum evicted; the running-sum family rep is the
    # trailing-30d RANGE-frame revenue window
    "running sum window": "win_trailing_30d_revenue",
    # topk shapes: BM25 top-k + ann row_number top-k
    "sort+limit / top-k": "text_bm25_topk",
    # setops_customer_years (DISTINCT variants) evicted after 6 green
    # rounds; the ALL-variants battery is the harder, fresher rep
    "set ops": "setops_all_variants",
    # rollup_pricing evicted (6 green rounds); the Expand-based operator
    # stays driver-checked via the CUBE grouping-sets battery
    "rollup/cube/groupingsets": "cube_order_priorities",
    # scalar_function_battery evicted (4 green rounds); the exact-
    # moments battery is the fresher function-battery rep
    "function battery": "stats_moments_battery",
}

# §2.C class → representative inside the window
CLASSES = {
    "dedup (banded LSH)": "dedup_minhash_lsh",
    "dedup (LSH tuning S-curve)": "dedup_lsh_tuning",
    "semantic dedup": "dedup_semantic",
    "similarity (exact top-k)": "ann_bruteforce_topk",
    "similarity (compressed / PQ-ADC)": "ann_pq_adc",
    "similarity (JL projection)": "emb_random_projection",
    "clustering (iterative)": "emb_kmeans_elbow",
    "dimensionality (PCA)": "emb_pca_power_iteration",
    "text (LM)": "text_kneser_ney_bigram",
    "text (lang id)": "text_lang_id",
    "text (quality)": "text_quality_score",
    "text (retrieval)": "text_bm25_topk",
    "multimodal (real decode)": "multimodal_scene_cuts",
    "multimodal (near-dup)": "multimodal_phash_dedup",
    "sampling (priority/PPS)": "sample_reservoir_priority",
    "splits (stratified)": "split_exact_stratified",
    "packing": "pack_sequences",
    "decontamination": "split_semantic_contamination",
    "streaming": "streaming_session_windows",
    "connector": "fs_connector_roundtrip",
    "sessionization": "sessionize_events",
    "gap fill": "events_gap_fill",
    "causal readout (diff-in-diff)": "events_diff_in_diff",
    "mergeable sketches (CM)": "heavy_hitters_countmin",
    "graph (iterative)": "graph_kcore_decomposition",
    "market basket (PCY)": "basket_pairs_pcy",
    "privacy": "privacy_t_closeness",
    "FP&A (Pareto/ABC)": "orders_pareto_abc",
    "eval (conformal)": "eval_conformal_threshold",
    "capstone corpus build": "corpus_build_train",
}

# Evicted §2.C veterans that must STAY registered + oracled (repo
# replica keeps hash-checking them every test run).
EVICTED_STAY_ORACLED = [
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q6_revenue_forecast",
    "fs_lsr",
    "fs_dus",
    "fs_suboff_prefix_sum",
    "fs_lock_arbitration",
    "fs_range_read",
    "fs_tail",
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


def test_rotation_freshness():
    """≥50% of the window must be first-time driver rows (r6 VERDICT #1).
    Skipped-degrade: if no CORRECTNESS artifacts exist (fresh clone),
    DRIVER_CHECKED is empty and every slot counts as fresh."""
    fresh = [n for n in PRIORITY if n not in DRIVER_CHECKED]
    assert len(fresh) >= WINDOW // 2, (
        f"only {len(fresh)}/{WINDOW} window slots are first-time driver rows"
    )


def test_evicted_veterans_stay_oracled():
    reg = load_all()
    for name in EVICTED_STAY_ORACLED + list(FS_REPO_ORACLE.values()):
        assert name in reg, f"evicted veteran {name} fell out of the registry"
        assert reg[name].oracle is not None, f"{name} lost its oracle"


def test_window_is_oracle_checked():
    """EVERYTHING in the window is hash-checked."""
    reg = load_all()
    for name in list(reg)[:WINDOW]:
        assert reg[name].oracle is not None, f"{name} has no oracle in the window"
