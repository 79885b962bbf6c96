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
# ROUND-10 ROTATION (r9 VERDICT #1, executing the pre-staged plan): the
# eleven r7-green Q-* fs veterans reach the trailing-3-rounds cadence
# boundary and rotate back in, alongside the two permanent anchors
# (q1 flagship + connector) = 13 veterans. The remaining 37 slots go to
# the never-driver-checked backlog (114 after r9 landed 50/50 green),
# REQUIRED to include all 8 round-9 additions (text_chi2_keywords,
# eval_rank_rbo, text_yule_k, eval_rank_kendall, split_kfold_assignment,
# source_drift_emd, train_preference_pairs, eval_brier_decomposition).
# 37 >= the freshness test's 35-slot bound; cumulative driver-green goes
# 214 -> 251 of 331 if the window lands green (the three round-10
# additions — mixture_doremi_reweight, corpus_epoch_schedule,
# train_pair_overlap — queue for the r11 window), draining the backlog
# to 80 (on track for ~0 by r12-r13, r9 VERDICT #7). Every evicted r9
# name stays registered and hash-checked by the in-repo replica
# (tests/test_correctness.py) every test run.
PRIORITY: tuple[str, ...] = (
    # -------- veterans (13): the cadence-due Q-* fs skeleton...
    "fs_stat",  # Q-STAT
    "fs_ls",  # Q-LS
    "fs_du",  # Q-DU
    "fs_count",  # Q-COUNT
    "fs_len_from_blocks",  # Q-LEN nested Array(Struct) fold
    "fs_block_locations",  # Q-BLOCKLOC wraparound interval match
    "fs_content",  # Q-CONTENT two-level reassembly
    "fs_getmerge",  # Q-MERGE
    "fs_rename",  # Q-RENAME anchored-prefix rewrite
    "fs_delete",  # Q-DELETE subtree + orphan cascade
    "fs_mkdirs",  # Q-MKDIR ancestor closure
    # ...plus the permanent anchors: TPC-H flagship (sf1-verified
    # decimal lattice) and the 7-M6 Python Data Source connector
    "q1_pricing_summary",
    "fs_connector_roundtrip",
    # -------- first-time driver rows (37), never in any prior window.
    # the 8 round-9 additions (r9 VERDICT #1 requires all of them):
    "text_chi2_keywords",  # supervised keyword selection (this round:
    # single presence pass + pinned overflow ladder, r9 VERDICT #5)
    "eval_rank_rbo",  # rank-biased overlap on the dyadic lattice
    "text_yule_k",  # vocabulary-richness constant
    "eval_rank_kendall",  # Kendall tau ranking agreement
    "split_kfold_assignment",  # k-fold CV protocol
    "source_drift_emd",  # pairwise EMD drift (this round: div-idiom fix)
    "train_preference_pairs",  # DPO pairs (this round: banded-rank
    # de-skew, r9 VERDICT #4 -- first driver row exercises the new plan)
    "eval_brier_decomposition",  # Murphy decomposition
    # fs analytics: maintenance planners never driver-checked
    "fs_repair_plan",
    "fs_heat_tiering",
    "fs_erasure_layout",
    # TPC-H shapes: two-flag distribution (q12), supplier variety with
    # NOT-IN complaint filter (q16)
    "q12_priority_by_returnflag",
    "q16_part_supplier_variety",
    # relational profiling: whole-table profile + join-key skew profile
    "table_profile",
    "skew_key_profile",
    # graph battery over the LSH candidate graph: degree spectrum,
    # clustering coefficient, modularity of the LPA communities
    "graph_degree_distribution",
    "graph_clustering_coefficient",
    "graph_modularity_score",
    # dedup: fuzzy prefix-blocked verify + cross-source overlap matrix
    "dedup_fuzzy_prefix",
    "dedup_source_matrix",
    # multimodal: image diversity (Simpson index over pixel classes)
    "multimodal_image_simpson",
    # privacy: per-user contribution bounding (DP prep)
    "privacy_contribution_bounds",
    # sampling: systematic PPS, Neyman allocation, balanced classes
    # (the banded-rank pattern train_preference_pairs now shares),
    # temperature-scaled mixture weights
    "sample_systematic_pps",
    "sample_neyman_allocation",
    "sample_balanced_classes",
    "mixture_temperature",
    # embeddings: hard-negative triplet mining + per-label centroids
    "emb_triplet_mining",
    "embedding_label_centroids",
    # text: exact token accounting, rolling-hash fingerprint,
    # readability battery
    "text_token_count",
    "text_fingerprint",
    "text_readability",
    # eval: PR-AUC (exact trapezoid lattice) + Cohen's kappa
    "eval_pr_auc",
    "eval_kappa_agreement",
    # event-time: hourly EWMA (exact rational) + bot detection
    "events_ewma_hourly",
    "events_bot_detection",
    # streaming: stream-static enrichment join
    "streaming_enrichment_join",
    # FP&A: Benford first-digit audit
    "orders_benford_audit",
)

# ROUND-11 ROTATION PLAN (pre-staged; execute next round): keep the two
# permanent anchors (q1 + connector); the r8-green six Q-* veterans
# (fs_lsr fs_dus fs_suboff_prefix_sum fs_lock_arbitration fs_range_read
# fs_tail) reach the trailing-3 boundary after r10 and are DUE; that
# leaves ~42 slots for the backlog (77 after this window lands),
# prioritizing the oldest never-checked names (the r5-r6-era text/eval
# battery additions) and any round-10 additions. Keep the freshness
# test's >=35 bound satisfied and update FS_IN_WINDOW -> FS_DUE_R11 in
# tests/test_registry_window.py.
#
# Prior windows (r1-r9): see git history for each round's slot-by-slot
# changelog -- CORRECTNESS_r{N}.json records what each window proved.
# (The full tuples were kept here as dead data through r9; r9 ADVICE:
# git history IS the changelog.)


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
