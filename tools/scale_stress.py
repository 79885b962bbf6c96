"""10x scale stress sweep (VERDICT r2 #8): run the heaviest headline
queries at sf0.1 and at the 10x var/sf1 fixture (tools/make_scale_fixture.py)
and report per-query scaling exponents.

exponent = log10(t_sf1 / t_sf0.1)  — 1.0 is perfectly linear in data
volume; < 1 means fixed overheads still dominate; > 1 is superlinear and
a scale bug. Methodology matches bench.py: ingest re-layout + cache
warmup billed separately, noop sink (no driver transfer), best of 2.

Usage: python tools/scale_stress.py [shuffle_partitions]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from snackfs_spark.registry import load_all  # noqa: E402
from snackfs_spark.session import get_spark  # noqa: E402

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "split_contamination_check",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "sessionize_events",
    "win_running_order_total",
    "fs_content",
    "text_profile",
    "emb_kmeans_assign",
    "dedup_semantic",
    "dedup_semantic_scaled",
    "text_tfidf_topk",
    "text_bigram_prob",
    "text_bm25_topk",
    "multimodal_audio_energy",
    "events_rate_anomaly",
    "corpus_build_v2",
    "split_semantic_contamination",
    # round-6 ops: chunk-hash collapse + combinatoric pair counts, and
    # the two tiny-key roll-ups (bucketing report, compaction planner)
    "dedup_source_matrix",
    "pack_length_buckets",
    "fs_compaction_plan",
    # later round-6 ops: the iterative BPE trainer, the one-pass
    # profiler, the sharded shuffle, the histogram, and the skew probe
    "bpe_learn_merges",
    "table_profile",
    "training_order_shuffle",
    "events_value_histogram",
    "skew_key_profile",
    "heavy_hitters_countmin",
    "bpe_segment_corpus",
    "dedup_prefix_filter",
    "events_quantiles_binned",
    "source_vocab_similarity",
    "events_trend_regression",
    # round-5-of-the-build ops: real WAV/BMP codecs, text-verb decode,
    # the new TPC-H shapes' heavy members, passage chunking, PII scrub,
    # and the negative-sampling join
    "multimodal_decode_features",
    "multimodal_resize",
    "fs_text_decode",
    "q9_product_profit",
    "q21_straggler_suppliers",
    "q16_part_supplier_variety",
    "doc_chunk_sliding",
    "events_pii_scan",
    "emb_negative_sampling",
    "approx_distinct_hll",
    "events_winsorized_stats",
    "corpus_snapshot_diff",
    "dq_check_battery",
    "join_size_estimate_cm",
    # late round-5 ops: the offline fsck join and the token-proportional
    # span-dedup shuffle
    "fs_fsck",
    "dedup_span_ngrams",
    "dedup_entity_resolution",
    "corpus_incremental_stats",
    "fs_replica_sets",
    "corpus_takedown_audit",
    "pit_feature_join",
    "events_drift_tv",
    "approx_overlap_hll",
    "events_attribution",
    "corpus_funnel_report",
    # layout analytics: one fact scan -> 512 bucket-stat rows
    "layout_zorder_skipping",
    # sort-free CCNet tertiles (bigram LM + bounded histogram split)
    "text_perplexity_buckets",
    # bounded-QI privacy audit
    "privacy_k_anonymity",
    # measured LSH S-curve (3 bandings vs exact-recall truth)
    "dedup_lsh_tuning",
    # sort-free exact AUC / PR curve (bounded score histogram)
    "eval_quality_auc",
    # bounded-histogram skyline (oracle is the quadratic NOT EXISTS)
    "corpus_pareto_front",
    # A-priori frequent pairs (basket-key self-join, bounded fan-out)
    "basket_frequent_pairs",
    # Markov next-event transitions (one user-keyed window pass)
    "events_markov_transitions",
    # contingency purity + Rand index over the k-means assignment
    "eval_cluster_agreement",
    # multi-query BM25 ranking eval (one token scan, bounded outputs)
    "eval_retrieval_ranks",
    # real-decode aHash + banded Hamming join (planted dup truth)
    "multimodal_phash_dedup",
    # gzip JSONL interchange roundtrip (shard count = read parallelism)
    "corpus_jsonl_roundtrip",
    # set-homomorphic Merkle digests + mismatched-bucket drill-down
    "fs_repair_plan",
    # explicit runtime bloom prune before the verify semi-join
    "rel_bloom_runtime_filter",
    # islands + prefix-sum trailing-window distinct (no COUNT DISTINCT re-scan)
    "win_sliding_distinct_users",
    # PQ codes + ADC lookup-table scoring (32x-compressed ANN path)
    "ann_pq_adc",
    # one full-outer-join MERGE apply (update/delete/insert in one pass)
    "corpus_merge_upsert",
    # dow x hour lattice profile + seasonal-naive error
    "events_seasonal_profile",
    # quoted uncompressed CSV interchange (splittable container)
    "corpus_csv_roundtrip",
    # frontier-expansion BFS over the bounded token graph
    "graph_bfs_hops",
    # RS(4,2) stripe planner + ring host-diversity audit
    "fs_erasure_layout",
    # stratum-wise systematic PPS by cumulative character mass
    "sample_systematic_pps",
    # tf-weighted cosine verify over LSH candidates (rational gate)
    "dedup_tf_cosine",
    # exact-proportion stratified split (md5-rank cut per stratum)
    "split_exact_stratified",
    # lift-ranked collocations (log-free PMI substrate)
    "text_collocation_lift",
    # directional near-subset pairs (containment >= 0.8, rational gate)
    "dedup_containment",
    # C(s,R) quorum-read staleness model over injected replica faults
    "fs_quorum_staleness",
    # first-occurrence DAU decomposition + lifetime user curve
    "events_new_vs_returning",
    # PrefixSpan-style sequential 2-patterns via (first, last) bounds
    "events_sequential_pairs",
    # attribute-disclosure (homogeneity) audit over bounded QI classes
    "privacy_l_diversity",
    # survivorship merge per near-dup cluster (golden record)
    "dedup_golden_record",
    # build-round-6 ops: winnowed selection + fp equi-join, PCY bucket
    # gate, type-partitioned CUSUM windows, vocab-keyed KN margins, the
    # doc-keyed heat join, and the single-shuffle roll-ups
    "dedup_winnow_fingerprint",
    "basket_pairs_pcy",
    "events_cusum_changepoint",
    "text_kneser_ney_bigram",
    "fs_heat_tiering",
    "orders_rfm_segments",
    "privacy_contribution_bounds",
    "sample_reservoir_priority",
    "eval_calibration_ece",
    "eval_kappa_agreement",
    # batch 2: the equi-depth range planner, cluster-safe splits,
    # exact join-order advisor, tokenizer fertility, Heaps-law curve
    "layout_range_partition_plan",
    "split_cluster_safe",
    "rel_join_order_advisor",
    "bpe_fertility_by_source",
    "text_vocab_growth",
    # batch 3: watermark lateness, HLL prefix union, degree histogram,
    # PCM VAD islands, trailing-hour rate-cap audit
    "events_watermark_audit",
    "approx_hll_daily_union",
    "graph_degree_distribution",
    "multimodal_audio_vad",
    "events_rate_limit_audit",
    # batch 4: novelty decay, centroid drift, ring rebalance, yield curve
    "corpus_novelty_curve",
    "emb_centroid_drift",
    "fs_hotspot_rebalance_plan",
    "corpus_dedup_rate_curve",
    # batch 5: burstiness, bot triage, image brightness drift
    "text_burstiness",
    "events_bot_detection",
    "multimodal_brightness_drift",
    # batch 6: dedup removal bill, temporal holdout
    "corpus_dedup_impact",
    "split_temporal_holdout",
    # batch 7: Benford digit audit, Zipf octaves, DiD, the in-engine
    # perceptron trainer, JL random projection
    "orders_benford_audit",
    "text_zipf_octaves",
    "events_diff_in_diff",
    "text_quality_perceptron",
    "emb_random_projection",
    # batch 8: conformal, bootstrap CI, ABC, k-core, ring scaling
    "eval_conformal_threshold",
    "eval_bootstrap_ci",
    "orders_pareto_abc",
    "graph_kcore_decomposition",
    "fs_ring_scaling_plan",
    # batch 9: privacy ladder, SRM, harmonic centrality, resample, RAKE
    "privacy_generalization_ladder",
    "sample_srm_check",
    "graph_harmonic_centrality",
    "multimodal_audio_resample",
    "text_rake_keywords",
    # batch 10: duplicates, stop list, conversion lag, t-closeness, elbow
    "orders_duplicate_payments",
    "text_stop_list_induction",
    "events_conversion_lag",
    "privacy_t_closeness",
    "emb_kmeans_elbow",
    # batch 11: PVM, Gini, McNemar, assortativity, scene cuts
    "lineitem_pvm_decomposition",
    "orders_revenue_gini",
    "eval_mcnemar_paired",
    "graph_degree_assortativity",
    "multimodal_scene_cuts",
    # batch 12: lang confusion, Neyman, cohort LTV, PCA
    "eval_lang_confusion",
    "sample_neyman_allocation",
    "orders_cohort_ltv",
    "emb_pca_power_iteration",
    # batch 13: readability, RFM migration, anisotropy, balanced classes
    "text_readability",
    "orders_rfm_migration",
    "emb_anisotropy_score",
    "sample_balanced_classes",
    # batch 14: clustering coefficient, split composition, Simpson
    "graph_clustering_coefficient",
    "split_distribution_check",
    "multimodal_image_simpson",
    # round-7 ops: KM survival (calendar-bounded grid), Holt forecast
    # (month-grid fold), LPA communities (bounded graph rounds), and
    # the exact two-proportion test (2-row algebra after one scan)
    "events_survival_km",
    "orders_holt_linear_forecast",
    "graph_label_propagation",
    "events_two_proportion_test",
    # round-7 batch 2: K-1 broadcast-argmax corpus passes; delta sweep
    # + calendar-bounded prefix sum
    "sample_coreset_kcenter",
    "orders_open_backlog",
    # round-7 batch 3: two-phase banded rank + bucket join (no global
    # sort); broadcast 3-term postings filter + one doc-keyed aggregate
    "dedup_entity_snm",
    "retrieval_boolean_query",
    # round-7 batch 4: ORC interchange scan; bigram broadcast-join
    # dictionary match; point-in-time aging (two map-side collapses)
    "corpus_orc_roundtrip",
    "text_blocklist_scan",
    "orders_ar_aging",
    # round-7 batch 5: metadata-lattice rollup; one lag window + user
    # rollup + top-k
    "fs_permission_audit",
    "events_conformance_audit",
    # round-7 batch 6: one corpus pass -> bounded-pool MMR rounds
    "retrieval_mmr_topk",
    # round-7 batch 7: one tokenize pass -> two partial-distinct aggs
    "text_distinct_ngrams",
    # round-7 batch 8: one metadata scan -> depth-lattice collapses
    "fs_namespace_profile",
    # round-8 ops: |V|²-bounded wedge join + anti-join + top-k;
    # K-per-group sketch then broadcast algebra; two ranking evals on
    # the shared BM25 pipeline; calendar-bounded lag windows; basket
    # self-join with downward-closure pruning; streaming keyed state
    "graph_jaccard_link_prediction",
    "approx_kmv_theta_sketch",
    "eval_ndcg_at_k",
    "eval_pr_auc",
    "orders_seasonal_naive_mase",
    "mining_association_rules",
    "streaming_cdc_upsert",
    # modularity rides the LPA rounds + two candidate-sized joins;
    # apportionment is one scan -> |sources| algebra
    "graph_modularity_score",
    "corpus_budget_apportionment",
    # triplet mining = ann_bruteforce posture (broadcast anchors, one
    # corpus scan, WindowGroupLimit); power grid = 2-row arm algebra
    "emb_triplet_mining",
    "sample_ab_power_grid",
    # isotonic fit: bigram scoring pass + <= 11^3 bounded algebra
    "eval_isotonic_calibration",
    # drawdown: calendar-bounded running-extremes windows;
    # Mann-Whitney: two-phase banded rank, 2-row test algebra
    "orders_max_drawdown",
    "sample_mann_whitney_u",
    # KS: same banded-rank substrate, 1-row max-gap algebra
    "sample_ks_two_sample",
    # round-9 ops: chi-square keyword selection (one DISTINCT presence
    # shuffle + broadcast contingency algebra + per-class top-k), RBO
    # (k-row algebra off the memoized hybrid pipeline), Yule's K (one
    # token scan -> (source, token) counts -> |sources| rows)
    "text_chi2_keywords",
    "eval_rank_rbo",
    "text_yule_k",
    # round-9 batch 2: k x k pair algebra off the memoized ranking;
    # per-stratum ranking window -> |sources| x K collapse
    "eval_rank_kendall",
    "split_kfold_assignment",
    # round-9 batch 3: one doc scan -> (source, bin) lattice -> bounded
    # pairwise CDF algebra
    "source_drift_emd",
    # round-9 batch 4 (re-shaped r10): two-phase banded rank — bounded
    # (source, q, md5-bucket) prefix histogram + in-bucket row_number,
    # no per-source corpus-wide sort — then the rank equi-join
    "train_preference_pairs",
    # round-9 batch 5: the ece posture — bigram scoring pass, <= 11-bin
    # histogram, bounded decimal algebra
    "eval_brier_decomposition",
    # round 10: one corpus scan -> checkpointed |sources|-row relation
    # -> unrolled bounded multiplicative-weight algebra
    "mixture_doremi_reweight",
    # round 10b: same posture — one scan, closed-form shift algebra
    "corpus_epoch_schedule",
    # round 10c: pair ids join back to token-set projections on the
    # pair key; per-row set algebra, no pairwise blowup
    "train_pair_overlap",
    # round 11: one task-keyed aggregate -> unrolled falling-factorial
    # codegen (pass@k); group aggregate + co-keyed join back with an
    # exact per-group isqrt (GRPO advantage)
    "eval_pass_at_k",
    "train_grpo_advantage",
    # round 11 batch 2: per-task ranking window + binomial-weighted
    # aggregate (best-of-n); (source, q) histogram -> dense lattice ->
    # CDF windows -> bounded pair join (tournament)
    "eval_best_of_n_curve",
    "source_quality_tournament",
    # round 11 batch 3: broadcast queries x one corpus pass, all prefix
    # cosines in the same scan, shared query-keyed ranking windows
    "emb_matryoshka_recall",
]

SF_DIRS = {"0.1": "/root/testdata/sf0.1", "1": str(_REPO / "var/sf1")}


def driver_mem_for(max_sf: float) -> str:
    """sf -> driver memory for a local[N] sweep (r8 VERDICT #6): in
    local mode the driver JVM hosts all executor threads, so the heap
    must scale with the largest fixture or the sweep half-runs (the r8
    100x sweep OOMed at the default 8g until 48g was found by hand).
    An explicit SPARK_GRAFT_DRIVER_MEM always wins — this is only the
    default the sweep script derives from its own arguments."""
    if max_sf <= 1:
        return "8g"
    if max_sf <= 3:
        return "24g"
    if max_sf <= 10:
        return "48g"
    return "96g"


def main() -> None:
    # usage: scale_stress.py [shuffle_partitions] [label=dir ...]
    shuffle = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dirs = dict(SF_DIRS)
    if len(sys.argv) > 2:
        sf_dirs = dict(arg.split("=", 1) for arg in sys.argv[2:])
    labels = list(sf_dirs)
    # SCALE_STRESS_SKIP=q1,q2 drops queries (e.g. the deliberately
    # superlinear fixed-k semdedup from a 100x run, where its measured
    # 10x blowup already makes the point and 10000x pairs would not end)
    skip = {q for q in (os.environ.get("SCALE_STRESS_SKIP") or "").split(",") if q}
    queries = [q for q in QUERIES if q not in skip]
    # SCALE_STRESS_ONLY=q1,q2 restricts to a subset (targeted re-sweeps
    # of newly added operators without re-running the whole battery)
    only = {q for q in (os.environ.get("SCALE_STRESS_ONLY") or "").split(",") if q}
    if only:
        queries = [q for q in queries if q in only]
    registry = load_all()
    # size the local-mode driver heap to the sweep's largest fixture
    # BEFORE the JVM starts (r8 VERDICT #6); explicit env wins
    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
        max_sf = max(float(sf) for sf in labels)
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = driver_mem_for(max_sf)
        print(
            f"# driver memory {os.environ['SPARK_GRAFT_DRIVER_MEM']}"
            f" (max sf {max_sf})",
            file=sys.stderr,
        )
    spark = get_spark("scale_stress")
    # the larger fixture has Nx the rows per shuffle key-space; size
    # partitions so a partition stays ~base-sized (the knob a real
    # cluster turns).
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))

    from snackfs_spark.sources import fsmodel, tables

    results: dict[str, dict[str, float]] = {n: {} for n in queries}
    for sf, sf_dir in sf_dirs.items():
        tables.build_ingest_cache(spark, sf_dir)
        registry["q6_revenue_forecast"].fn(spark, sf_dir).collect()
        fsmodel.files_df(spark, sf_dir).count()
        fsmodel.content_df(spark, sf_dir).count()
        fsmodel.locks_df(spark, sf_dir).count()
        for name in queries:
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                df = registry[name].fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - start)
            results[name][sf] = round(best, 3)
            print(f"# sf{sf} {name}: {best:.3f}s", file=sys.stderr)

    base, big = labels[0], labels[-1]
    decades = math.log10(float(big) / float(base))
    table = {
        name: {
            f"sf{base}_sec": t[base],
            f"sf{big}_sec": t[big],
            "ratio": round(t[big] / t[base], 2),
            "exponent": round(math.log10(t[big] / t[base]) / decades, 2),
        }
        for name, t in results.items()
    }
    out = {"shuffle_partitions": shuffle, "queries": table}
    print(json.dumps(out, indent=1))
    (_REPO / "var/scale_stress.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
