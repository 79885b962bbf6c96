"""Frequent-pattern mining over order baskets (SURVEY.md §2.C extension
surface): A-priori frequent 2-itemsets — the classic market-basket
shape, re-expressed as two hash aggregations and one key-bounded
self-join.

The A-priori downward-closure lever: a pair can only reach min-support
if BOTH its items do, so the item-support pass runs first and the
basket relation is semi-join-pruned to frequent items before any pair
is generated. Pair generation self-joins the pruned baskets on the
basket key — the fan-out per basket is C(items, 2) with basket size
bounded by the data model (TPC-H orders hold ~4-7 lineitems), so the
shuffle is a constant factor of the basket relation, never quadratic
in the catalog.

Reference parity note: the reference (a Cassandra-backed filesystem;
SURVEY.md §2.A) has no mining surface; this extends the engine's
training-pipeline side the same way the graph and sketch operators do.

Determinism: supports are exact integers; no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snackfs_spark.registry import register
from snackfs_spark.sources.tables import load_table

# Standard absolute min-support knob. On the uniform synthetic baskets
# a corpus-relative threshold is degenerate (expected pair support is
# ~constant in sf because the part catalog scales with the fact table),
# so the knob is absolute, as in the classic A-priori formulation.
BASKET_MINSUP = 3


@register(
    "basket_frequent_pairs",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM li),
    item AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS support FROM li GROUP BY l_partkey
    ),
    freq AS (SELECT l_partkey, support FROM item WHERE support >= {BASKET_MINSUP}),
    b AS (SELECT li.l_orderkey, li.l_partkey FROM li JOIN freq USING (l_partkey)),
    pairs AS (
      SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS pair_support
      FROM b x JOIN b y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, p.pair_support,
           fa.support AS support_a, fb.support AS support_b,
           n.n_baskets
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN n
    WHERE p.pair_support >= {BASKET_MINSUP}
    """,
)
def basket_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 2-itemsets over order baskets at BASKET_MINSUP
    min-support: part pairs bought together, with per-item supports
    and the basket universe size (confidence = pair_support/support_a
    and lift = pair_support*n_baskets/(support_a*support_b) are one
    exact-integer division away for any consumer).

    Scale: item supports collapse map-side to catalog size. The
    downward-closure prune semi-joins baskets to frequent items BEFORE
    pair generation, and the pair self-join shuffles on the basket key
    with per-basket fan-out bounded by basket size — both relations are
    basket-proportional, never catalog². Support joins at the end run
    key-hashed (the frequent-item relation is catalog-proportional, so
    it is never broadcast — the 100x-sweep OOM lesson)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("support"))
    freq = item.filter(F.col("support") >= BASKET_MINSUP)
    b = li.join(freq.hint("shuffle_hash").select("l_partkey"), "l_partkey")
    x = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    y = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pairs = (
        x.join(y, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= BASKET_MINSUP)
    )
    fa = freq.select(
        F.col("l_partkey").alias("part_a"), F.col("support").alias("support_a")
    )
    fb = freq.select(
        F.col("l_partkey").alias("part_b"), F.col("support").alias("support_b")
    )
    return (
        pairs.join(fa.hint("shuffle_hash"), "part_a")
        .join(fb.hint("shuffle_hash"), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "pair_support",
            "support_a",
            "support_b",
            "n_baskets",
        )
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total
    FROM trans
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's
    time-ordered event sequence: (from_type, to_type, n, from_total) —
    the next-event model behind session simulation and anomalous-flow
    detection; P(to|from) = n/from_total is one exact division away.

    Scale: one shuffle on user_id feeds the LEAD window (the same
    partitioning sessionization uses), transitions then collapse
    map-side onto the type-pair key space (|types|^2, a constant), and
    the row-total is a window over that bounded relation — so after the
    sequence pass everything is O(|types|^2) state regardless of corpus
    size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    trans = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return trans.select(
        "from_type", "to_type", "n", F.sum("n").over(wt).alias("from_total")
    )


# Sequential-pattern mining (PrefixSpan's 2-sequence core): how many
# users exhibit "A, then later B" at least once — NOT the adjacent
# transition matrix (events_markov_transitions) and NOT a fixed funnel
# (events_conversion_funnel): every ordered type pair, any gap. The
# per-user reduction to FIRST-A-before-LAST-B makes existence exact
# without enumerating event pairs.
SEQPAIR_MIN_USERS = 3


@register(
    "events_sequential_pairs",
    oracle=f"""
    WITH bounds AS (
      SELECT user_id, event_type,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM bounds a
      JOIN bounds b ON b.user_id = a.user_id
                   AND b.event_type <> a.event_type
                   AND a.first_ts < b.last_ts
      GROUP BY 1, 2
    ),
    u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS total_users FROM events)
    SELECT type_a, type_b, n_users, u.total_users,
           CAST((1000 * n_users) // u.total_users AS BIGINT) AS support_permille
    FROM pairs CROSS JOIN u
    WHERE n_users >= {SEQPAIR_MIN_USERS}
    """,
)
def events_sequential_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent sequential 2-patterns: users with any occurrence of
    type_a strictly before some later occurrence of type_b. Existence
    collapses to first(A) < last(B) per user, so the engine reduces
    each user to |types| (first, last) bounds and self-joins THOSE —
    per-user fan-out is at most |types|², never events² (the PrefixSpan
    projection trick, specialized to length-2 patterns).

    Scale: one (user, type) aggregate collapses the fact map-side; the
    bounds self-join shuffles user-keyed rows whose per-user volume is
    bounded by the type vocabulary; pattern counts collapse onto the
    |types|² lattice. Support is integer permille of the user universe
    (truncating division, identical both engines)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    a = bounds.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("type_a"),
        "first_ts",
    )
    b = bounds.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("type_b"),
        "last_ts",
    )
    pairs = (
        a.join(b, "u")
        .filter(
            (F.col("type_a") != F.col("type_b"))
            & (F.col("first_ts") < F.col("last_ts"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= SEQPAIR_MIN_USERS)
    )
    u = ev.agg(F.count_distinct("user_id").alias("total_users"))
    return pairs.crossJoin(F.broadcast(u)).select(
        "type_a",
        "type_b",
        "n_users",
        "total_users",
        F.expr("(1000 * n_users) div total_users").cast("long").alias(
            "support_permille"
        ),
    )


# ------------------------------------------------------ PCY bucket prune ----
#
# PCY (Park-Chen-Yu 1995): pass 1 counts PAIR HASH BUCKETS instead of
# pairs; pass 2 counts only pairs whose bucket reached min-support. The
# prune is LOSSLESS — bucket_count >= pair_support, so a pruned pair is
# provably infrequent — which is why the oracle below is the PLAIN
# frequent-pairs SQL: a value-hash match against the unpruned answer IS
# the proof the bucket pass dropped nothing.
#
# Where basket_frequent_pairs shuffles every generated pair onto its own
# (part_a, part_b) key (~mostly-unique keys; the suite's steepest honest
# exponent, SCALE.md), PCY shuffles (a) narrow int bucket ids whose
# count collapses map-side and (b) only the ~Poisson(load >= minsup)
# fraction of pairs that survive the bucket gate — so the wide final
# hash-aggregate materializes ~1% of the pair keys. The bucket space is
# the published memory knob: it must scale with pair volume for the
# prune to bite, so it derives from the basket count IN-PLAN (load
# factor 6/16 at the TPC-H ~4-item basket size) rather than being a
# fixed constant that dies one decade up — the dedup_semantic_scaled
# lesson applied to mining.
PCY_BUCKETS_PER_BASKET = 16


@register(
    "basket_pairs_pcy",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS support FROM li GROUP BY l_partkey
    ),
    freq AS (SELECT l_partkey FROM item WHERE support >= {BASKET_MINSUP}),
    b AS (SELECT li.l_orderkey, li.l_partkey FROM li JOIN freq USING (l_partkey))
    SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS pair_support
    FROM b x JOIN b y
      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {BASKET_MINSUP}
    """,
)
def basket_pairs_pcy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 2-itemsets via the PCY bucket prune: identical output to
    the A-priori pair pass at BASKET_MINSUP (the oracle is the plain
    unpruned SQL — the hash match proves losslessness), but the engine
    never hash-aggregates the full pair-key space.

    Plan: (1) item pass + downward-closure prune as in
    basket_frequent_pairs; (2) bucket pass — every candidate pair hashes
    to md5_bucket(pair, n_buckets) with n_buckets = 16 x n_baskets
    derived in-plan, and bucket counts collapse map-side onto narrow int
    keys; (3) pair pass — pairs re-generate (cheaper than checkpointing
    the pair relation) and semi-join the frequent-bucket set on the
    bucket key (shuffle-hash, never broadcast: the frequent-bucket
    relation is corpus-proportional in the worst case — the 100x-sweep
    OOM lesson), so only bucket-frequent pairs reach the exact count."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("support"))
    freq = item.filter(F.col("support") >= BASKET_MINSUP).select("l_partkey")
    b = li.join(freq.hint("shuffle_hash"), "l_partkey")
    n_buckets = b.agg(
        (F.count_distinct("l_orderkey") * PCY_BUCKETS_PER_BASKET).alias("nb")
    )

    from snackfs_spark.functions import md5_fp

    x = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    y = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pair_key = F.concat_ws(
        "|", F.col("part_a").cast("string"), F.col("part_b").cast("string")
    )

    def pairs_with_bucket():
        return (
            x.join(y, "k")
            .filter(F.col("part_a") < F.col("part_b"))
            .crossJoin(F.broadcast(n_buckets))
            .withColumn("bucket", md5_fp(pair_key) % F.col("nb"))
        )

    hot_buckets = (
        pairs_with_bucket()
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bc"))
        .filter(F.col("bc") >= BASKET_MINSUP)
        .select("bucket")
    )
    return (
        pairs_with_bucket()
        .join(hot_buckets.hint("shuffle_hash"), "bucket", "left_semi")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= BASKET_MINSUP)
        .select("part_a", "part_b", "pair_support")
    )
