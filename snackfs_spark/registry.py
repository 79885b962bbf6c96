"""Query registry: the single source of truth wiring SURVEY.md §2 operators
to (a) a PySpark callable and (b) the equivalent DuckDB oracle SQL.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.

Register with the decorator:

    @register("q1_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q1(spark, sf_dir): ...

Oracle-less (non-SQL-expressible) operators pass ``oracle=None`` and get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 registered queries,
# so the iteration order of `load_all()` is normative: these 50 SPAN
# SURVEY.md §2 — the §2.B Q-* skeleton crew, the declared operator
# families, and at least one oracle-checked query per §2.C class (dedup,
# ANN, text, multimodal, sampling, streaming). Variants and batteries
# beyond the span register after the window (still covered by the
# in-repo oracle replica, tests/test_correctness.py, which hash-checks
# ALL registered queries at sf0.01 every test run).
#
# ROUND-7 ROTATION (r6 VERDICT #1): by round 6, 198 of 288 registered
# queries had never produced a driver-side green row — their correctness
# rested on the in-repo replica alone. This window keeps 15 veterans
# (the fs skeleton crew + the connector + one anchor per §2.C pillar)
# and hands 35 slots to queries that have NEVER been driver-checked
# (70% of the window is first-time driver evidence). Every evicted
# veteran stays green in the in-repo replica; the per-slot comments
# name where each evicted family/class stays hash-checked.
PRIORITY: tuple[str, ...] = (
    # -------- veterans kept (15): the fs skeleton crew (10 of the 17
    # Q-* targets — each evicted Q-* has 1-6 rounds of green driver rows
    # already and stays in the in-repo replica: fs_lsr/fs_dus (subtree
    # aggregation shapes live on via fs_du), fs_suboff_prefix_sum /
    # fs_lock_arbitration (window shapes live on via win_trailing_30d_
    # revenue and sessionize_events), fs_range_read/fs_tail (byte-offset
    # slicing lives on via fs_content's block-bounded reassembly),
    # fs_fsck (its FULL OUTER JOIN shape lives on via corpus_build_train
    # legs)), the connector, and one anchor per §2.C pillar.
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
    "fs_connector_roundtrip",
    # TPC-H anchor: filter + group-agg with decimal lattice sums (q3/q5/
    # q6 have 6 rounds of green rows each; their join/broadcast shapes
    # stay driver-checked via q2/q21 below)
    "q1_pricing_summary",
    # §2.C anchors: banded-signature dedup and broadcast top-k ANN (the
    # two load-bearing similarity postures every rotated-in variant
    # composes with)
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    # -------- first-time driver rows (35) — never in any prior window.
    # TPC-H shapes: correlated-min subquery + broadcast dim chain (q2),
    # UNION/INTERSECT/EXCEPT ALL variants (setops_customer_years's
    # 3-branch distinct form is the veteran), 4-way exists/not-exists
    # self-join (q21), and the salting remedy for skewed join keys
    "q2_min_cost_supplier",
    "setops_all_variants",
    "q21_straggler_suppliers",
    "rel_salted_skew_join",
    # event-time analytics: 30-min-gap sessionization, as-of backward
    # join, calendar gap-fill, CUPED-free diff-in-diff readout
    "sessionize_events",
    "asof_last_error_before_purchase",
    "events_gap_fill",
    "events_diff_in_diff",
    # sketches: Count-Min heavy hitters (events_quantiles_binned and
    # approx_distinct_hll each hold 1-2 green driver rounds; the
    # mergeable-sketch class rep rotates to the CM row — the HLL and
    # binned-quantile forms stay repo-oracle green)
    "heavy_hitters_countmin",
    # graph: iterative k-core peeling over LSH-candidate edges
    "graph_kcore_decomposition",
    # function batteries: exact moments (skew/kurtosis as decimal-exact
    # rationals) rotate in for scalar_function_battery (4 green rounds;
    # scalar/string/date/array/map batteries stay repo-oracle green)
    "stats_moments_battery",
    # market-basket mining with PCY bucket pruning + first-order Markov
    # transition matrix via grouping-sets cube
    "basket_pairs_pcy",
    "cube_order_priorities",
    # privacy ladder capstone: t-closeness (EMD over ordered quantiles);
    # k-anonymity/l-diversity stay repo-oracle green
    "privacy_t_closeness",
    # FP&A: Pareto/ABC banding (the decimal(38,0) widening exhibit) and
    # the trailing-30d range-frame running sum (the running-sum family
    # rep after fs_suboff_prefix_sum's eviction)
    "orders_pareto_abc",
    "win_trailing_30d_revenue",
    # eval: split-conformal threshold calibration
    "eval_conformal_threshold",
    # semantic dedup: the fixed-k SemDeDup form gets its first driver
    # row (the size-adaptive production variant dedup_semantic_scaled
    # holds 2 green rounds and stays repo-oracle green)
    "dedup_semantic",
    # text: interpolated Kneser-Ney bigram LM, n-gram language ID,
    # Gopher-style quality gate, and BM25 retrieval top-k (text_profile
    # composes lang_id+quality and holds 2 green rounds)
    "text_kneser_ney_bigram",
    "text_lang_id",
    "text_quality_score",
    "text_bm25_topk",
    # decontamination rotates to the embedding-space variant
    # (split_contamination_check holds 2 green rounds, stays repo-green)
    "split_semantic_contamination",
    # embeddings/ANN: PCA power iteration, k-means elbow (model
    # selection), PQ/ADC compressed search, JL projection acceptance
    "emb_pca_power_iteration",
    "emb_kmeans_elbow",
    "ann_pq_adc",
    "emb_random_projection",
    # LSH banding S-curve tuning (measured precision/recall vs truth)
    "dedup_lsh_tuning",
    # sampling/splits: priority (sequential-Poisson) sampling, exact
    # stratified split, greedy first-fit sequence packing
    "sample_reservoir_priority",
    "split_exact_stratified",
    "pack_sequences",
    # multimodal: real-decode scene cuts (BMP luma deltas) and pHash
    # near-dup banding (multimodal_audio_energy holds 2 green rounds)
    "multimodal_scene_cuts",
    "multimodal_phash_dedup",
    # streaming rotates to session windows (streaming_hourly_rollup
    # holds 5 green rounds; drained-equality pins stay in tests)
    "streaming_session_windows",
    # capstone rotates to the train-split builder (corpus_build_v2
    # holds 2 green rounds, stays repo-oracle green)
    "corpus_build_train",
)


def load_all() -> dict[str, Query]:
    """Import every operator module (each registers its queries) and return
    the registry, PRIORITY names first (see above), the rest in
    registration order."""
    # Imports are side-effecting by design; keep the list explicit so a
    # missing module is an error, not silent coverage loss.
    from snackfs_spark.operators import (  # noqa: F401
        clustering,
        content,
        dedup,
        fsops,
        functions_battery,
        graph,
        interval_join,
        layout,
        mining,
        multimodal,
        relational,
        runtime_filter,
        sampling,
        similarity,
        textstats,
        windows,
    )
    from snackfs_spark.streaming import ingest  # noqa: F401

    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
