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
# ROUND-11 ROTATION (r10 VERDICT #1, executing the pre-staged plan):
# the six r8-green Q-* fs veterans (fs_lsr fs_dus fs_suboff_prefix_sum
# fs_lock_arbitration fs_range_read fs_tail) reached the trailing-3
# cadence boundary after r10 and rotate back in, alongside the two
# permanent anchors (q1 flagship + connector) = 8 veterans. The
# remaining 42 slots all go to the never-driver-checked backlog (80
# after r10 landed 50/50 green) — the first 42 in registration order,
# which includes ALL THREE round-10 additions (mixture_doremi_reweight,
# corpus_epoch_schedule, train_pair_overlap) as r10 VERDICT #1
# requires. 42 >= the freshness test's 35-slot bound; cumulative
# driver-green goes 251 -> 293 of 331 if the window lands green,
# draining the backlog to 38 — which fits entirely inside the ROUND-12
# window (r10 VERDICT #3; see the pre-staged plan below). Every evicted
# r10 name stays registered and hash-checked by the in-repo replica
# (tests/test_correctness.py) every test run.
PRIORITY: tuple[str, ...] = (
    # -------- veterans (8): the cadence-due Q-* fs rows...
    "fs_lsr",  # Q-LSR recursive listing
    "fs_dus",  # Q-DUS subtree rollup
    "fs_suboff_prefix_sum",  # Q-SUBOFF running-sum window
    "fs_lock_arbitration",  # Q-LOCK row_number ranking
    "fs_range_read",  # Q-RANGE block-range slice
    "fs_tail",  # Q-TAIL tail reassembly
    # ...plus the permanent anchors: TPC-H flagship (sf1-verified
    # decimal lattice) and the 7-M6 Python Data Source connector
    "q1_pricing_summary",
    "fs_connector_roundtrip",
    # -------- first-time driver rows (42), never in any prior window;
    # the first 42 backlog names in registration order.
    # clustering / embedding-space diagnostics:
    "eval_cluster_agreement",  # ARI on the exact pair lattice
    "emb_centroid_drift",  # per-label centroid drift across splits
    "emb_anisotropy_score",  # embedding-space anisotropy readout
    # corpus dedup economics:
    "corpus_dedup_rate_curve",  # marginal dup rate vs corpus growth
    "corpus_dedup_impact",  # token savings by dedup tier
    # graph battery over the LSH candidate graph:
    "graph_harmonic_centrality",
    "graph_degree_assortativity",
    "graph_jaccard_link_prediction",
    # fs + layout planners:
    "fs_hotspot_rebalance_plan",
    "layout_range_partition_plan",
    # event analytics:
    "events_sequential_pairs",  # co-occurring event-type pairs
    "distinct_users_per_type_twophase",  # two-phase distinct agg
    "timeseries_correlation",  # exact-lattice hourly correlation
    "events_value_outliers",  # robust MAD outlier fence
    "events_value_histogram",  # log2-bucket value histogram
    "events_winsorized_stats",  # winsorized/trimmed means
    "join_size_estimate_cm",  # count-min join-size estimate
    "events_drift_tv",  # total-variation drift between weeks
    "rel_join_order_advisor",  # FK-graph join-order advisor
    "approx_hll_daily_union",  # sliding distinct via HLL merge
    # privacy / FP&A:
    "privacy_generalization_ladder",  # k-anon generalization search
    "orders_duplicate_payments",  # near-dup payment detection
    "lineitem_pvm_decomposition",  # price-volume-mix bridge
    "orders_revenue_gini",  # revenue concentration (exact Gini)
    "orders_rfm_migration",  # RFM segment migration matrix
    "approx_kmv_theta_sketch",  # KMV theta-sketch set algebra
    # training-mixture / curriculum (incl. ALL THREE r10 additions):
    "curriculum_token_budget",  # pacing-function token schedule
    "mixture_doremi_reweight",  # r10 addition (REQUIRED this window)
    "corpus_epoch_schedule",  # r10 addition (REQUIRED; this round:
    # DECIMAL(38,0)/HUGEINT numerator + degenerate-source guard)
    "training_order_shuffle",  # deterministic sharded shuffle
    # corpus lifecycle:
    "corpus_snapshot_diff",  # version diff (add/mod/del/same)
    "corpus_incremental_stats",  # mergeable per-batch stats
    "corpus_funnel_report",  # pipeline-stage funnel
    "sample_srm_check",  # sample-ratio-mismatch chi2 gate
    "split_distribution_check",  # per-split distribution parity
    "corpus_budget_apportionment",  # largest-remainder apportionment
    "sample_ab_power_grid",  # A/B power analysis grid
    "train_pair_overlap",  # r10 addition (REQUIRED): DPO pair audit
    "emb_negative_sampling",  # frequency-smoothed negative tables
    # BPE / text pipeline:
    "bpe_pair_counts",  # adjacent-pair counts (BPE step)
    "text_redact",  # PII pattern redaction
    "text_repetition",  # max n-gram repetition score
)

# ROUND-12 ROTATION PLAN (pre-staged; execute next round, r10 VERDICT
# #3): keep the two permanent anchors (q1 + connector). No fs veteran
# is cadence-due: the r11 six rotate out with fresh green rows, and the
# eleven r10-green Q-* rows hit the trailing-3 boundary only AFTER r12
# lands (due in the r13 window). That leaves 48 slots for the
# remaining 38-name backlog (text_diversity .. streaming_dedup_bounded,
# in registration order): the ENTIRE backlog fits, taking cumulative
# driver-green to 331/331, plus ~10 spare slots for any round-11/12
# additions (new queries register -> put them in the r12 window).
# The freshness bound (>=35) holds with 38+ first-timers. Update
# FS_DUE_R11 -> trailing-green in tests/test_registry_window.py when
# executing.
#
# Prior windows (r1-r10): see git history for each round's slot-by-slot
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
