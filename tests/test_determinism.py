"""Determinism under parallelism: the property the whole oracle design
rests on (SCALE.md 'Global posture'). Every hash-checked aggregate
accumulates in exact decimal / integer-lattice / min-max space, so the
SAME query must produce bit-identical rows under different shuffle
partition counts — the local stand-in for running on a differently
sized cluster. A query that only passes at one partition count would
flap the driver's value hash the day the cluster resizes."""

from __future__ import annotations

import pytest

from snackfs_spark.registry import load_all
from tests.conftest import SF_SMALL

REG = load_all()

# The queries whose numeric paths are the riskiest: decimal sums,
# integer-lattice means (k-means, bigram), minhash min-aggregates, and
# the left-fold cosine chain.
PROBES = [
    "q1_pricing_summary",
    "win_running_order_total",
    "dedup_minhash_lsh",
    "emb_kmeans_assign",
    "dedup_semantic_scaled",
    "text_bigram_prob",
    "ann_ivf_probe",
    "text_bm25_topk",
    "corpus_build_v2",
    "split_semantic_contamination",
    # round 5: global-prefix-sum decomposition and bounded top-k ties
    "curriculum_token_budget",
    "text_cooccurrence_topk",
    # round 6: lattice-summed PageRank (dangling mass + in-sums are
    # bigint sums; only the final per-node expression is double)
    "graph_pagerank_tokens",
    # round 7: combinatoric pair counts over collapsed chunk-hash rows,
    # and the integer-sqrt temperature weights (single exact double div)
    "dedup_source_matrix",
    "mixture_temperature",
    # the K-round BPE trainer: argmax ties broken lexicographically,
    # fold re-segmentation — the riskiest new iterative path
    "bpe_learn_merges",
    # float-emitting round-7 paths: cosine over bigint dots, OLS slope
    # over decimal(38) lattice sums
    "source_vocab_similarity",
    "events_trend_regression",
    # round 8 (build round 5): decimal profit rollup and the Q11
    # HAVING-against-global-total (decimal sum x bigint count compare)
    "q9_product_profit",
    "q11_important_parts",
    # round 9 (late build round 5): the span-merge islands window (order
    # by position within doc) and the single-division dup_frac double
    "dedup_span_ngrams",
    # round 10: the decimal(38)-accumulated Mann-Whitney AUC and the
    # contingency-margin Rand index — both emit one correctly-rounded
    # double from an exact rational; the division must not see
    # partition-order-dependent operands
    "eval_quality_auc",
    "eval_cluster_agreement",
    # round-5 continuation: the PQ/ADC chain (left-fold squared-L2
    # dists feed argmin codes AND the query LUT — any partition-order
    # leak would flap both the codes and the adc double), the tf-cosine
    # map-fold numerator + per-row sqrt, and the seasonal lag window
    # (observed-week ordering under repartition)
    "ann_pq_adc",
    "dedup_tf_cosine",
    "events_seasonal_profile",
    "win_sliding_distinct_users",
    # build round 6: the float-emitting new paths — ECE's decimal gap
    # sum -> one rounded double, kappa's exact-rational quotient, the
    # Kneser-Ney common-denominator quotient, RFM's decimal monetary
    # cast, and the winnow rightmost-min string aggregate (min over a
    # window frame must not see partition-order-dependent operands)
    "eval_calibration_ece",
    "eval_kappa_agreement",
    "text_kneser_ney_bigram",
    "orders_rfm_segments",
    "dedup_winnow_fingerprint",
    # round-6 batch 3: the HLL prefix-union estimate (one portable
    # float per day over an exact integer lattice sum — the windows
    # and per-bucket maxes feeding it must be partition-independent)
    "approx_hll_daily_union",
    # round 9: the chi2 lattice over distinct-presence counts (the
    # DISTINCT dedup + per-class top-k ties must be partition-free),
    # the RBO curve off the double-ordered hybrid rerank, Yule's K
    # frequency-of-frequencies sums, and the excess-curve drawdown
    # (1-row mean broadcast feeding an ordered window)
    "text_chi2_keywords",
    "eval_rank_rbo",
    "text_yule_k",
    "orders_max_drawdown",
    # round-9 batch 2: pair algebra off the double-ordered rerank, and
    # the per-stratum md5-rank fold assignment
    "eval_rank_kendall",
    "split_kfold_assignment",
    # round-9 batch 3: the dense-axis CDF windows under repartition
    "source_drift_emd",
    # round-9 batch 4: mirrored-rank pairing must be partition-free
    "train_preference_pairs",
    # round-9 batch 5: decimal contribution sums over the bin lattice
    "eval_brier_decomposition",
    # round 10: unrolled multiplicative-weight rounds — every singleton
    # aggregate (weighted mean, totals) must be partition-independent
    # bigint algebra
    "mixture_doremi_reweight",
    "corpus_epoch_schedule",
    "train_pair_overlap",
]


@pytest.mark.parametrize("name", PROBES)
def test_bit_identical_across_partition_counts(name, spark):
    from snackfs_spark.memo import clear_all_memos

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # drop the session memos before EACH build: a memoized pipeline
        # (bigram scores, BPE chain, candidate graph, ...) would hand
        # the second config the first config's checkpointed relation
        # and the probe would pass vacuously (r11 optimization round)
        clear_all_memos()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(map(tuple, REG[name].fn(spark, SF_SMALL).collect()))
        clear_all_memos()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = sorted(map(tuple, REG[name].fn(spark, SF_SMALL).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        clear_all_memos()
    assert a == b, f"{name}: results differ between 32 and 7 shuffle partitions"
