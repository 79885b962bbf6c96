"""Scalar-function batteries (SURVEY.md §2.B final paragraph / §2.D):
the string/date/array/map function library the engine exposes. The
reference only touches replaceFirst, path-string surgery, and date
formatting (SnackFSShell.scala:33,316; ThriftStore.scala:534-540);
everything here is built-in Catalyst, declared so the oracle pins the
cross-engine semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snackfs_spark.functions import ts_str
from snackfs_spark.registry import register
from snackfs_spark.sources.tables import load_table


@register(
    "string_function_battery",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           replace(c_name, '#', '-') AS dashed,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           strpos(c_name, '1') AS first_one,
           reverse(c_mktsegment) AS revseg,
           substr(c_name, 1, 8) AS prefix8,
           repeat('ab', 3) AS abx3,
           CAST(length(c_name) AS INT) AS name_len
    FROM customer WHERE c_custkey % 50 = 0
    """,
)
def string_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library: case, pad, replace, trim, locate, reverse, repeat."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 50 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.locate("1", F.col("c_name")).cast("long").alias("first_one"),
        F.reverse("c_mktsegment").alias("revseg"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.repeat(F.lit("ab"), 3).alias("abx3"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "date_function_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(dayofmonth(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           strftime(CAST(o_orderdate AS DATE) + 90, '%Y-%m-%d') AS due_date,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S.%f') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(datediff('day', TIMESTAMP '1992-01-01 00:00:00', o_orderdate) AS BIGINT)
             AS days_since_92
    FROM orders WHERE o_orderkey % 200 = 0
    """,
)
def date_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time library: extract fields, truncation, arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 200 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        # dates surface as yyyy-MM-dd strings: Spark DateType and DuckDB
        # DATE reach pandas as different dtypes and would hash apart
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 90), "yyyy-MM-dd")
        .alias("due_date"),
        ts_str(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd")
        .alias("month_end"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).cast("long").alias("days_since_92"),
    )


@register(
    "array_function_battery",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(embedding[64] AS DOUBLE) AS last_component,
           CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)
             AS max_component,
           CAST(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)
             AS min_component,
           CAST(len(list_filter(embedding, x -> x >= 0)) AS INT) AS n_nonneg
    FROM embeddings WHERE vec_id % 20 = 0
    """,
)
def array_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array library over the embedding column: size, index, min/max,
    higher-order filter — the ops an array<float> feature column needs."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.filter(F.col("vec_id") % 20 == 0).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.element_at("embedding", 64).cast("double").alias("last_component"),
        F.array_max(dbl).alias("max_component"),
        F.array_min(dbl).alias("min_component"),
        F.size(F.filter(F.col("embedding"), lambda x: x >= 0)).alias("n_nonneg"),
    )


@register(
    "map_function_battery",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           json_keys(props)[1] AS first_key,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL AS has_k
    FROM events WHERE event_id % 100 = 0
    """,
)
def map_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/JSON library: parse the props JSON into map<string,long> and
    exercise map_keys/element_at/size — per-row expressions, no shuffle."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(m, "k").isNotNull().alias("has_k"),
    )
