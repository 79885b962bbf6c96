"""Runtime Bloom-filter join pruning (SURVEY.md §2.B join-family
extension): the scan-side semi-join prune every warehouse engine applies
to selective dim-fact joins, hand-rolled from deterministic md5 bits so
the filter itself is portable, inspectable, and testable.

Spark's own optimizer injects the same shape when
``spark.sql.optimizer.runtime.bloomFilter.enabled`` fires (an internal
``BloomFilterMightContain`` on the fact scan). This operator makes the
mechanism explicit: build k-bit signatures of the dim keys, OR them into
a fixed bitmap AGGREGATED AS 64-bit WORDS (a ~16k-row map-side-combined
groupBy — never a driver-side sketch), broadcast the bitmap as one map
row, and probe it inside the fact scan's codegen before any shuffle.
False positives are removed by the exact semi-join that follows, so the
RESULT is exact regardless of bloom saturation — the bloom only decides
how many fact rows reach the shuffle.

Scale: the bitmap is M_BITS/64 longs (~128 KiB) no matter the corpus;
the probe is per-row md5 arithmetic in whole-stage codegen with a
single-row broadcast (BroadcastNestedLoopJoin on one row, not a
key-hashed broadcast of the dim). The verify semi-join runs shuffle-hash
over ONLY the surviving candidates — on the synthetic workload the
bloom passes ~selectivity + fp of the fact, so the shuffle the plain
semi-join would pay on the full fact is paid on a fraction of it. The
production sizing lever is M_BITS ∝ dim NDV (Spark's native filter
sizes from runtime stats); at this catalog's 100× the 2^20-bit map
stays under ~5% fp with k=4.

Reference parity: the reference (SURVEY.md §2.A) joins its INode
metadata to block rows without any scan-side prune; this is the
Spark-first upgrade of that join path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snackfs_spark.functions import dsum, md5_fp, money
from snackfs_spark.registry import register
from snackfs_spark.sources.tables import load_table

# 2^20 bits = 16 Ki words of 64 bits (~128 KiB broadcast). k=4 salted
# md5 bit positions per key. With n dim keys, fp ≈ (1 - e^(-k·n/M))^k:
# ~0 at sf0.1 (n≈1.4e4), ~5% at sf10 (n≈1.4e6... see docstring lever).
M_BITS = 1 << 20
N_WORDS = M_BITS // 64
BLOOM_K = 4


def _bit_positions(key: F.Column) -> list[F.Column]:
    """k deterministic bit positions for a key: the engine-wide md5
    fingerprint (snackfs_spark.functions.md5_fp), salted, mod M_BITS."""
    return [
        md5_fp(F.concat_ws(":", key.cast("string"), F.lit(str(salt)))) % M_BITS
        for salt in range(BLOOM_K)
    ]


def bloom_bitmap(keys: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame holding the bitmap as MAP<word_idx, word>:
    explode each key into k bit positions, OR bits into ≤N_WORDS words
    (map-side combine collapses the groupBy to bitmap size), then fold
    the words into a single broadcastable map row."""
    pos = keys.select(
        F.explode(F.array(*_bit_positions(F.col(key_col)))).alias("pos")
    )
    words = (
        pos.select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("bloom")
    )


def bloom_filter_candidates(
    df: DataFrame, key_col: str, bloom: DataFrame
) -> DataFrame:
    """Scan-side prune: keep rows whose key has all k bloom bits set.
    The one-row bitmap broadcasts (BroadcastNestedLoopJoin on a single
    row); the probe is md5 arithmetic + map lookups in codegen. Missing
    words coalesce to 0 — absent ⇒ definitely not in the dim key set."""
    out = df.crossJoin(F.broadcast(bloom))
    tmp = []
    for i, pos in enumerate(_bit_positions(F.col(key_col))):
        tmp.append(f"_bpos_{i}")
        out = out.withColumn(f"_bpos_{i}", pos)
    cond = " AND ".join(
        f"(coalesce(element_at(bloom, _bpos_{i} DIV 64), CAST(0 AS BIGINT))"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(_bpos_{i} % 64 AS INT))) != 0"
        for i in range(BLOOM_K)
    )
    return out.filter(F.expr(cond)).drop("bloom", *tmp)


@register(
    "rel_bloom_runtime_filter",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 0
    )
    GROUP BY 1
    """,
)
def rel_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order count + revenue for orders by in-debt BUILDING
    customers, computed with an explicit runtime bloom prune: the fact
    scan drops non-candidate orders BEFORE the semi-join shuffle, and
    the exact shuffle-hash semi-join removes bloom false positives, so
    the result is hash-identical to the plain semi-join the oracle runs
    (cross-algorithm check: the bloom must never drop a true match).

    Scale: dim-side work is one filtered customer scan exploded ×k into
    a ≤16 Ki-key aggregate; fact-side work is one codegen probe pass
    plus a shuffle of only the surviving ~selectivity·fact rows. The
    dim side of the verify join is corpus-proportional, so it is
    shuffle-hashed, never broadcast (the 100×-sweep OOM lesson)."""
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 0))
        .select("c_custkey")
    )
    bloom = bloom_bitmap(dim, "c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cand = bloom_filter_candidates(orders, "o_custkey", bloom)
    exact = cand.join(
        dim.hint("shuffle_hash"),
        cand["o_custkey"] == dim["c_custkey"],
        "left_semi",
    )
    return (
        exact.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice"), "revenue"),
        )
    )
