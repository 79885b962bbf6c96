"""The driver's correctness gate checks the FIRST 50 registered queries.
These tests pin that the window spans SURVEY.md §2: every filesystem
Q-* target, every declared operator family, and every §2.C class."""

from __future__ import annotations

from snackfs_spark.registry import PRIORITY, load_all

WINDOW = 50

# Q-* → query name (SURVEY §2.B, 17 targets)
FS_TARGETS = {
    "Q-STAT": "fs_stat",
    "Q-LS": "fs_ls",
    "Q-LSR": "fs_lsr",
    "Q-DU": "fs_du",
    "Q-DUS": "fs_dus",
    "Q-COUNT": "fs_count",
    "Q-LEN": "fs_len_from_blocks",
    "Q-BLOCKLOC": "fs_block_locations",
    "Q-SUBOFF": "fs_suboff_prefix_sum",
    "Q-LOCK": "fs_lock_arbitration",
    "Q-CONTENT": "fs_content",
    "Q-RANGE": "fs_range_read",
    "Q-TAIL": "fs_tail",
    "Q-MERGE": "fs_getmerge",
    "Q-RENAME": "fs_rename",
    "Q-DELETE": "fs_delete",
    "Q-MKDIR": "fs_mkdirs",
}

# family → representative query inside the window
FAMILIES = {
    "filter/projection": "q6_revenue_forecast",
    "equi-join+agg": "q3_shipping_priority",
    "broadcast dims": "q5_regional_revenue",
    # rel_price_band_join yielded its window slot to the round-5
    # rotation; the family's hash-checked rep is the Q-BLOCKLOC
    # broadcast interval join (token-ring ranges with wraparound)
    "non-equi join": "fs_block_locations",
    # win_topk_orders_per_customer yielded its slot to the sliding-
    # distinct rotation; ranking windows stay hash-checked via
    # ann_bruteforce_topk's per-query row_number top-k
    "window ranking": "ann_bruteforce_topk",
    # win_running_order_total yielded its slot to the bloom-prune
    # rotation; the running-sum shape is Q-SUBOFF's prefix sum
    "running sum": "fs_suboff_prefix_sum",
    # topk_orders yielded its slot to the round-6 CUSUM rotation; the
    # TakeOrderedAndProject shape stays hash-checked via q3's
    # ORDER BY revenue LIMIT 10
    "sort+limit": "q3_shipping_priority",
    "set ops": "setops_customer_years",
    # rollup_pricing is the family rep; the groupingsets/cube variants
    # exercise the same Expand-based operator and are covered by the
    # in-repo oracle replica outside the window (r2 VERDICT slot advice)
    "rollup/groupingsets": "rollup_pricing",
    "scalar functions": "scalar_function_battery",
}

# §2.C class → representative
CLASSES = {
    "dedup": "dedup_minhash_lsh",
    "semantic dedup": "dedup_semantic_scaled",
    "similarity": "ann_bruteforce_topk",
    # emb_kmeans_assign yielded its slot to the round-6 cluster-safe
    # split; the iterative-algorithm class stays hash-checked via the
    # K-round BPE trainer (same loop/broadcast-argmax pattern)
    "clustering (iterative)": "bpe_learn_merges",
    "text": "text_profile",
    "multimodal": "multimodal_audio_energy",
    "sampling": "corpus_build_v2",
    "decontamination": "split_contamination_check",
    "streaming": "streaming_hourly_rollup",
    "connector": "fs_connector_roundtrip",
    "tokenizer training (iterative)": "bpe_learn_merges",
    # round-5 rotation (r4 VERDICT #1): the two round-4 flagships get
    # driver-hard rows; fs_ls_limited / q18_large_orders move to the
    # in-repo oracle replica (their families stay represented above)
    "exact-recall similarity join": "dedup_prefix_filter",
    "mergeable quantile sketch": "events_quantiles_binned",
    # round-5 swap: the explicit-register HLL replaces approx_aggregates
    # as the approximate-aggregates rep — same family, but hash-checked
    # (its registers and estimate are engine-portable); approx_aggregates
    # stays registered post-window with golden pins
    "approx distinct (mergeable HLL)": "approx_distinct_hll",
    # late-round-5 rotation: q7/q10 (families covered by q3/q5/q13)
    # yield slots to the two newest flagships — the store consistency
    # scan (the window's only FULL OUTER JOIN shape) and span-level
    # exact-substring dedup (a dedup granularity no other query has)
    "consistency scan (fsck)": "fs_fsck",
    "span-level dedup": "dedup_span_ngrams",
    # final round-5 rotation: q13 / rel_price_band_join /
    # dedup_embedding_cosine (families still represented — see the
    # PRIORITY comments) yield slots to the storage-layout report, the
    # sort-free CCNet corpus partitioner, and entity-resolution linkage
    "storage layout / data skipping": "layout_zorder_skipping",
    "corpus partitioning (CCNet)": "text_perplexity_buckets",
    "record linkage (entity resolution)": "dedup_entity_resolution",
    # round-5 continuation rotation: q22 / win_topk / win_running_total
    # (shapes still represented — see PRIORITY comments) yield slots to
    # the MERGE mutation verb, the sliding-window distinct count, and
    # the explicit runtime bloom-filter join prune
    "merge / CDC apply": "corpus_merge_upsert",
    "sliding-window distinct": "win_sliding_distinct_users",
    "runtime join pruning": "rel_bloom_runtime_filter",
    # round-6 rotation: dedup_exact / topk_orders (families still
    # represented — see PRIORITY comments) yield slots to the winnowed-
    # fingerprint locality sketch and the CUSUM changepoint scan
    "locality-sketch dedup (winnowing)": "dedup_winnow_fingerprint",
    "changepoint detection (CUSUM)": "events_cusum_changepoint",
    "leakage-free splitting (cluster-safe)": "split_cluster_safe",
}


def test_priority_fits_window():
    assert len(PRIORITY) <= WINDOW
    assert len(set(PRIORITY)) == len(PRIORITY)


def test_window_order_and_span():
    reg = load_all()
    names = list(reg)
    window = set(names[:WINDOW])
    # load_all puts PRIORITY first, verbatim
    assert names[: len(PRIORITY)] == list(PRIORITY)
    for target, q in {**FS_TARGETS, **FAMILIES, **CLASSES}.items():
        assert q in window, f"{target} ({q}) fell outside the driver's window"


def test_window_is_oracle_checked():
    """EVERYTHING in the window is hash-checked (since round 5: the
    explicit-register HLL replaced the engine-private-sketch query, so
    even the approximate-aggregates slot carries an oracle)."""
    reg = load_all()
    for name in list(reg)[:WINDOW]:
        assert reg[name].oracle is not None, f"{name} has no oracle in the window"
