"""Storage-layout analytics: quantify data-skipping effectiveness.

`sources/zorder.py` provides the Morton-curve writer (the Delta
OPTIMIZE ZORDER analog). This module closes the loop with an
oracle-checked QUERY that measures what the layout buys: for a workload
of 2-D range predicates, how many file-sized buckets must be read under
a single-column (linear) sort versus a z-ordered sort. This is the
report a table-maintenance service runs before deciding whether a
100 TB re-cluster pays for itself — the whole analysis is one scan plus
arithmetic over a few hundred bucket-stat rows.

Everything is integer arithmetic (scaling, bit interleave, bucket ids,
rectangle intersection), so the comparison is bit-identical in any
engine at any partitioning — no float in sight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snackfs_spark.registry import register
from snackfs_spark.sources.tables import load_table
from snackfs_spark.sources.zorder import Z_BITS, zorder_key

# 256 buckets per layout = the "file" granularity of the model: bucket
# stats play the role of parquet footer min/max. 2^8 buckets over a
# 2^16 scaled domain means a z bucket covers a 4096x4096 rectangle
# (8 high z bits = 4 from each dimension) while a linear bucket covers
# a 256-wide full-height slab.
LAYOUT_BUCKET_BITS = 8
_SPAN = (1 << Z_BITS) - 1  # 65535

# Workload: a 4x4 grid of query rectangles, each 1/8 of the scaled
# domain per dimension (~1.6% selectivity) — selective enough that
# skipping matters, spread so both dimensions' extremes are probed.
_Q_W = 1 << (Z_BITS - 3)  # 8192
_QUERIES = [
    (q, (q % 4) * (_SPAN + 1) // 4, (q % 4) * (_SPAN + 1) // 4 + _Q_W - 1,
     (q // 4) * (_SPAN + 1) // 4, (q // 4) * (_SPAN + 1) // 4 + _Q_W - 1)
    for q in range(16)
]


def _morton_sql(sa: str, sb: str, bits: int = Z_BITS) -> str:
    """The zorder_key bit interleave as portable SQL (DuckDB oracle)."""
    # CAST: a bare literal or narrow column is INT32 in DuckDB and the
    # high interleave bits overflow a 32-bit shift.
    a, b = f"CAST({sa} AS BIGINT)", f"CAST({sb} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _layout_oracle() -> str:
    values = ", ".join(
        f"({q}, {alo}, {ahi}, {blo}, {bhi})" for q, alo, ahi, blo, bhi in _QUERIES
    )
    zshift = 2 * Z_BITS - LAYOUT_BUCKET_BITS
    lshift = Z_BITS - LAYOUT_BUCKET_BITS
    return f"""
    WITH stats AS (
      SELECT MIN(l_orderkey) AS a_min, MAX(l_orderkey) AS a_max,
             MIN(l_partkey) AS b_min, MAX(l_partkey) AS b_max
      FROM lineitem
    ),
    scaled AS (
      SELECT ((l_orderkey - a_min) * {_SPAN}) // greatest(a_max - a_min, 1) AS sa,
             ((l_partkey - b_min) * {_SPAN}) // greatest(b_max - b_min, 1) AS sb
      FROM lineitem CROSS JOIN stats
    ),
    keyed AS (
      SELECT sa, sb, ({_morton_sql("sa", "sb")}) AS z FROM scaled
    ),
    layouts AS (
      SELECT 'linear' AS layout, sa >> {lshift} AS bucket, sa, sb FROM keyed
      UNION ALL
      SELECT 'zorder' AS layout, z >> {zshift} AS bucket, sa, sb FROM keyed
    ),
    bstats AS (
      SELECT layout, bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(sa) AS min_a, MAX(sa) AS max_a,
             MIN(sb) AS min_b, MAX(sb) AS max_b
      FROM layouts GROUP BY layout, bucket
    ),
    totals AS (
      SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_buckets_total
      FROM bstats GROUP BY layout
    ),
    queries(query_id, a_lo, a_hi, b_lo, b_hi) AS (VALUES {values}),
    reads AS (
      SELECT s.layout, q.query_id,
             CAST(COUNT(*) AS BIGINT) AS n_buckets_read,
             CAST(SUM(s.n_rows) AS BIGINT) AS n_rows_read
      FROM bstats s CROSS JOIN queries q
      WHERE NOT (s.max_a < q.a_lo OR s.min_a > q.a_hi
                 OR s.max_b < q.b_lo OR s.min_b > q.b_hi)
      GROUP BY s.layout, q.query_id
    )
    SELECT t.layout, CAST(q.query_id AS BIGINT) AS query_id,
           t.n_buckets_total,
           COALESCE(r.n_buckets_read, 0) AS n_buckets_read,
           COALESCE(r.n_rows_read, 0) AS n_rows_read
    FROM totals t CROSS JOIN queries q
    LEFT JOIN reads r ON r.layout = t.layout AND r.query_id = q.query_id
    """


@register("layout_zorder_skipping", oracle=_layout_oracle())
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping comparison: for 16 two-dimensional range queries
    over (l_orderkey, l_partkey), how many of 256 file-sized buckets
    each layout must read, judged by per-bucket min/max stats exactly
    as a parquet reader prunes row groups by footer stats. 'linear'
    buckets the sort order a single-column layout produces; 'zorder'
    buckets the Morton key `sources/zorder.py` writes. The z layout
    should read far fewer buckets on queries constraining BOTH columns
    — this query is the measurement that justifies (or rejects) paying
    the one-time re-cluster sort at 100 TB.

    Scale: one fact scan computes scaled keys and the Morton interleave
    as pure codegen'd bit arithmetic; the only shuffle is the
    (layout, bucket) aggregate onto 512 keys, fully map-side combined.
    Bucket stats (512 rows) cross the 16-query workload driver-free;
    everything after the scan is O(buckets x queries), independent of
    table size."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    stats = li.agg(
        F.min("l_orderkey").alias("a_min"),
        F.max("l_orderkey").alias("a_max"),
        F.min("l_partkey").alias("b_min"),
        F.max("l_partkey").alias("b_max"),
    )
    scaled = li.join(F.broadcast(stats)).selectExpr(
        f"((l_orderkey - a_min) * {_SPAN}) div greatest(a_max - a_min, 1) AS sa",
        f"((l_partkey - b_min) * {_SPAN}) div greatest(b_max - b_min, 1) AS sb",
    )
    # Bucket ids directly from the scaled keys: the z bucket is the TOP
    # 8 morton bits, which are exactly the 4-bit interleave of each
    # dimension's top 4 bits — the full 32-term interleave never
    # materializes. And instead of exploding every row 2x (one struct
    # per layout) through the partial aggregate, ONE pass collapses
    # map-side onto the <= 4096 (linear-bucket, z-bucket) PAIRS; each
    # layout's 256-bucket stats are a re-aggregate of that bounded
    # relation (grouping twice preserves count/min/max exactly).
    half = LAYOUT_BUCKET_BITS // 2
    pstats = (
        scaled.select(
            F.shiftrightunsigned(F.col("sa"), Z_BITS - LAYOUT_BUCKET_BITS).alias(
                "lb"
            ),
            zorder_key(
                F.shiftrightunsigned(F.col("sa"), Z_BITS - half),
                F.shiftrightunsigned(F.col("sb"), Z_BITS - half),
                bits=half,
            ).alias("zb"),
            "sa",
            "sb",
        )
        .groupBy("lb", "zb")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("sa").alias("min_a"),
            F.max("sa").alias("max_a"),
            F.min("sb").alias("min_b"),
            F.max("sb").alias("max_b"),
        )
        # <= 4096 pair rows: everything below is driver-free tiny-table
        # algebra, so pin the one corpus aggregate instead of
        # recomputing the scan per leg.
        .localCheckpoint(eager=False)
    )

    def _layer(layout: str, bucket_col: str) -> DataFrame:
        return pstats.groupBy(F.col(bucket_col).alias("bucket")).agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("min_a").alias("min_a"),
            F.max("max_a").alias("max_a"),
            F.min("min_b").alias("min_b"),
            F.max("max_b").alias("max_b"),
        ).select(F.lit(layout).alias("layout"), "bucket", "n_rows", "min_a", "max_a", "min_b", "max_b")

    bstats = _layer("linear", "lb").unionByName(_layer("zorder", "zb"))
    totals = bstats.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_buckets_total")
    )
    queries = spark.createDataFrame(
        _QUERIES, "query_id long, a_lo long, a_hi long, b_lo long, b_hi long"
    )
    reads = (
        bstats.crossJoin(F.broadcast(queries))
        .filter(
            ~(
                (F.col("max_a") < F.col("a_lo"))
                | (F.col("min_a") > F.col("a_hi"))
                | (F.col("max_b") < F.col("b_lo"))
                | (F.col("min_b") > F.col("b_hi"))
            )
        )
        .groupBy("layout", "query_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets_read"),
            F.sum("n_rows").alias("n_rows_read"),
        )
    )
    return (
        totals.crossJoin(F.broadcast(queries.select("query_id")))
        .join(reads, ["layout", "query_id"], "left")
        .select(
            "layout",
            F.col("query_id").cast("long").alias("query_id"),
            "n_buckets_total",
            F.coalesce("n_buckets_read", F.lit(0)).cast("long").alias("n_buckets_read"),
            F.coalesce("n_rows_read", F.lit(0)).cast("long").alias("n_rows_read"),
        )
    )


# ------------------------------------------------- range-partition plan ----
#
# The planning half of a global sort / range-partitioned write: pick
# RANGE_PARTS boundary keys so each partition holds ~1/P of the rows —
# exactly what Spark's RangePartitioner does by sampling, done here
# EXACTLY from an equi-width probe histogram (the same mergeable-bin
# idea as events_quantiles_binned, pointed at partitioning instead of
# quantiles). The report a re-sort job reads before committing a 100 TB
# shuffle: per planned partition, its bin range, row count, and load
# factor (permille of the perfectly-balanced share) — the skew evidence
# that decides whether event-time range partitioning is safe or needs
# salting.
RANGE_PARTS = 32
RANGE_BINS = 1024


@register(
    "layout_range_partition_plan",
    oracle=f"""
    WITH stats AS (
      SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi,
             CAST(COUNT(*) AS BIGINT) AS total
      FROM events
    ),
    binned AS (
      SELECT ((epoch_us(ts) - s.lo) * {RANGE_BINS}) // (s.hi - s.lo + 1) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events CROSS JOIN stats s GROUP BY 1
    ),
    cum AS (
      SELECT bin, n,
             COALESCE(SUM(n) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM binned
    )
    SELECT CAST(({RANGE_PARTS} * cum_before) // s.total AS BIGINT) AS partition_id,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(MIN(bin) AS BIGINT) AS lo_bin,
           CAST(MAX(bin) AS BIGINT) AS hi_bin,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST((1000 * SUM(n) * {RANGE_PARTS}) // s.total AS BIGINT) AS load_permille
    FROM cum CROSS JOIN stats s
    GROUP BY 1, s.total
    """,
)
def layout_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth range-partition plan for events by event time: assign
    each of RANGE_BINS probe bins to the partition its exclusive prefix
    count lands in ((P * cum_before) div total — the exact arithmetic a
    range partitioner wants), then report per-partition bin span, row
    count, and load_permille (1000 = perfectly balanced share).

    Scale: ONE corpus-proportional aggregate (the 1024-key bin count,
    fully map-side combined — the histogram is mergeable, so a 1000-
    executor cluster combines partials without a second scan); the
    prefix sum runs over the bounded bin table (the documented
    two-phase decomposition — the 'No Partition Defined' window is
    1024 rows by construction, never the corpus), and the plan rollup
    is <= RANGE_PARTS keys. The 1-row stats relation broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )
    binned = (
        ev.crossJoin(F.broadcast(stats))
        .selectExpr(
            f"((unix_micros(ts) - lo) * {RANGE_BINS}) div (hi - lo + 1) AS bin",
            "total",
        )
        .groupBy("bin", "total")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = binned.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    )
    return (
        cum.groupBy(
            F.expr(f"({RANGE_PARTS} * cum_before) div total").cast("long").alias(
                "partition_id"
            ),
            "total",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.min("bin").cast("long").alias("lo_bin"),
            F.max("bin").cast("long").alias("hi_bin"),
            F.sum("n").cast("long").alias("n_rows"),
            F.expr(f"(1000 * sum(n) * {RANGE_PARTS}) div any_value(total)")
            .cast("long")
            .alias("load_permille"),
        )
        .drop("total")
    )
