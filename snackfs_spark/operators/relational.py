"""Relational operator battery over the star-schema tables (SURVEY.md §2.B,
final paragraph): one query per operator family the reference's capabilities
map onto — filter/projection, equi-join + group-agg, broadcast join,
sort+limit, distinct/set-ops, rollup/cube, scalar functions.

All plans are declarative DataFrame compositions; Catalyst handles
pushdown/pruning/join selection. Scale notes per query in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snackfs_spark.functions import davg, dsum, money, rate
from snackfs_spark.registry import register
from snackfs_spark.sources.tables import load_table


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the group-by aggregation family (reference analog:
    du/dus/count subtree aggregation, SnackFSShell.scala:365-370,536-548).

    Scale: map-side partial aggregation into 6 groups — shuffle carries
    only per-partition partials, so this holds at any input size. Decimal
    accumulation keeps results deterministic under any parallelism.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity"), "sum_qty"),
            dsum(money("l_extendedprice"), "sum_base_price"),
            dsum(money("l_extendedprice") * (1 - rate("l_discount")), "sum_disc_price"),
            dsum(
                money("l_extendedprice")
                * (1 - rate("l_discount"))
                * (1 + rate("l_tax")),
                "sum_charge",
            ),
            (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(rate("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
