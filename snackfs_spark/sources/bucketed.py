"""Bucketed (co-located) table layout: the shuffle-elimination story for
repeated fact-fact joins at 100 TB.

Every `lineitem ⋈ orders` on the order key normally shuffles BOTH sides.
Bucketing both tables by the join key at write time pins row co-location
on disk, so every subsequent join (and groupBy on the same key) runs with
ZERO exchanges — at 100 TB that converts the dominant network cost of the
workload into a one-time ingest layout decision. This module is the
engine's bucketed-ingest path; tests/test_plans.py pins the no-Exchange
join plan.

The reference has the same idea in its storage layer: rows are dispersed
by path-hash into a fixed keyspace layout (ThriftStore.scala:243-247) so
related data co-locates by construction; buckets are Spark's native
expression of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snackfs_spark.sources.tables import load_table

DB = "snackfs_buckets"
N_BUCKETS = 8

# Fixture guard (r9 ADVICE): the catalog-existence check alone is not
# enough in a session that touches MORE THAN ONE sf_dir (benches,
# multi-fixture tests) — a second build call with a different fixture
# would return early and silently serve the FIRST fixture's data.
# Record what each bucketed table was built from, keyed by the Spark
# application id (a new session starts a new in-memory catalog), and
# rebuild on any mismatch.
_BUILT: dict[tuple[str, str], tuple[str, int]] = {}


def _is_current(
    spark: SparkSession, table: str, sf_dir: str, buckets: int, have: set[str]
) -> bool:
    key = (spark.sparkContext.applicationId, table)
    if table in have and _BUILT.get(key) == (sf_dir, buckets):
        return True
    _BUILT[key] = (sf_dir, buckets)
    return False


def build_bucketed_facts(spark: SparkSession, sf_dir: str, buckets: int = N_BUCKETS) -> None:
    """One-time ingest: write orders and lineitem bucketed + sorted by the
    order key. Idempotent per (session, sf_dir, buckets) — see _BUILT;
    a stale on-disk location from a previous session (the in-memory
    catalog does not persist table metadata) is cleared first."""
    import shutil  # noqa: PLC0415

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    have = {t.name for t in spark.catalog.listTables(DB)}
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for table, src, key in (
        ("orders_b", "orders", "o_orderkey"),
        ("lineitem_b", "lineitem", "l_orderkey"),
    ):
        if _is_current(spark, table, sf_dir, buckets, have):
            continue
        shutil.rmtree(f"{warehouse}/{DB}.db/{table}", ignore_errors=True)
        (
            load_table(spark, sf_dir, src)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"{DB}.{table}")
        )


def colocated_join(spark: SparkSession) -> DataFrame:
    """The co-located fact-fact join: order-priority revenue over
    lineitem ⋈ orders. With both sides bucketed by the key, the join
    itself needs no exchange — the only shuffle left is the final
    8-group aggregate."""
    li = spark.table(f"{DB}.lineitem_b")
    o = spark.table(f"{DB}.orders_b")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


def build_bucketed_baskets(spark: SparkSession, sf_dir: str, buckets: int = N_BUCKETS) -> None:
    """One-time ingest for the basket-mining family (r8 VERDICT #5):
    the deduplicated (l_orderkey, l_partkey) basket relation, bucketed
    AND sorted by the basket key. The A-priori pair generation is a
    basket-key SELF-join — with the relation bucketed on that key the
    join consumes two bucketed scans with ZERO exchange and (sorted
    buckets) zero sort, leaving the pair-count groupBy as the only
    shuffle. The distinct is paid once at ingest instead of once per
    mining query."""
    import shutil  # noqa: PLC0415

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    have = {t.name for t in spark.catalog.listTables(DB)}
    if _is_current(spark, "baskets_b", sf_dir, buckets, have):
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{DB}.db/baskets_b", ignore_errors=True)
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .write.bucketBy(buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{DB}.baskets_b")
    )


def association_rules_bucketed(spark: SparkSession) -> DataFrame:
    """mining_association_rules re-expressed over the bucketed basket
    table — identical semantics and output schema (the equality test
    pins it), but the basket self-join reads co-located buckets: no
    exchange, no sort on the join. This is the 100 TB layout lever the
    r8 sweep flagged (0.67/decade was the steepest exponent in the
    fleet; the self-join shuffle dominates it)."""
    from snackfs_spark.operators.mining import BASKET_MINSUP, RULE_MIN_CONF_PPM

    li = spark.table(f"{DB}.baskets_b")
    n = li.agg(F.count_distinct("l_orderkey").cast("long").alias("n_baskets"))
    item = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    freq = item.filter(F.col("support") >= BASKET_MINSUP).localCheckpoint(
        eager=False
    )
    b = li.join(F.broadcast(freq.select("l_partkey")), "l_partkey")
    x = b.alias("x")
    y = b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
        .filter(F.col("pair_support") >= BASKET_MINSUP)
    )
    rules = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "pair_support",
    ).unionByName(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "pair_support",
        )
    )
    fa = freq.select(
        F.col("l_partkey").alias("antecedent"), F.col("support").alias("support_ante")
    )
    fb = freq.select(
        F.col("l_partkey").alias("consequent"), F.col("support").alias("support_cons")
    )
    return (
        rules.join(F.broadcast(fa), "antecedent")
        .join(F.broadcast(fb), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "pair_support",
            "support_ante",
            "support_cons",
            F.expr("(1000000 * pair_support) div support_ante")
            .cast("long")
            .alias("confidence_ppm"),
            F.expr(
                "(CAST(1000000 AS decimal(38,0)) * pair_support * n_baskets)"
                " div (CAST(support_ante AS decimal(38,0)) * support_cons)"
            )
            .cast("long")
            .alias("lift_ppm"),
        )
        .filter(F.col("confidence_ppm") >= RULE_MIN_CONF_PPM)
    )
