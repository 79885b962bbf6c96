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


def build_bucketed_facts(spark: SparkSession, sf_dir: str, buckets: int = N_BUCKETS) -> None:
    """One-time ingest: write orders and lineitem bucketed + sorted by the
    order key. Idempotent per session (table existence check); a stale
    on-disk location from a previous session (the in-memory catalog does
    not persist table metadata) is cleared first."""
    import shutil  # noqa: PLC0415

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    have = {t.name for t in spark.catalog.listTables(DB)}
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for table, src, key in (
        ("orders_b", "orders", "o_orderkey"),
        ("lineitem_b", "lineitem", "l_orderkey"),
    ):
        if table in have:
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
