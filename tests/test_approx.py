"""Hard regression signal for the one rows-only window query
(approx_aggregates, VERDICT r2 #6).

What is pinnable bit-exact and what is not, measured not assumed:
- HLL++ distinct counts are partitioning-INVARIANT (register-wise max is
  a commutative idempotent merge) → pinned bit-exact at any layout.
- percentile_approx (QuantileSummaries) merges are compression-order
  sensitive: repartitioning shifts the reported quantile within its rank
  bound → pinned bit-exact on a FIXED single-partition read, and bounded
  by the declared rank error (n/accuracy) everywhere else.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from snackfs_spark.registry import load_all
from tests.conftest import SF_ORACLE

REG = load_all()

GOLDEN_HLL = {"approx_parts": 1947, "approx_orders": 14206}
# Spark 4.1 percentile_approx(accuracy=10000), sf0.01 lineitem read as a
# single partition (layout-independent pin).
GOLDEN_QUANTILES = {"p50_price": 53020.59, "p95_price": 99725.19, "p99_price": 103930.34}

QUANTILES = (("p50_price", 0.5), ("p95_price", 0.95), ("p99_price", 0.99))


def _approx_aggs():
    return [
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), 10000).alias("p50_price"),
        F.percentile_approx("l_extendedprice", F.lit(0.95), 10000).alias("p95_price"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), 10000).alias("p99_price"),
    ]


@pytest.fixture(scope="module")
def exact():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/lineitem.parquet')"
    )
    yield con
    con.close()


def _assert_rank_bound(con, row: dict) -> None:
    (n,) = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()
    for key, q in QUANTILES:
        (rank,) = con.execute(
            "SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= ?", [row[key]]
        ).fetchone()
        assert abs(rank - q * n) <= n / 10000 + 1, (key, rank, q * n)


def test_registered_query_golden_and_bounded(spark, exact):
    """The registered query (error-bound oracle form, r7 VERDICT #5):
    exact distincts match DuckDB bit-exact, and every within-bound flag
    the oracle pins to constant 1 is in fact 1 — i.e. the sketch
    estimates honored their published bounds on this fixture."""
    row = REG["approx_aggregates"].fn(spark, SF_ORACLE).collect()[0].asDict()
    exact_parts, exact_orders = exact.execute(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    assert row["exact_parts"] == exact_parts
    assert row["exact_orders"] == exact_orders
    flags = [k for k in row if k.endswith("_within_eps") or k.endswith("_rank_eps")]
    assert len(flags) == 5
    assert all(row[k] == 1 for k in flags), {k: row[k] for k in flags}


def test_quantile_sketch_golden_fixed_layout(spark):
    """Bit-exact quantile pin on a layout-independent read (one
    partition): a change here means the sketch algorithm changed."""
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").coalesce(1)
    row = li.agg(*_approx_aggs()).collect()[0].asDict()
    assert {k: row[k] for k in GOLDEN_QUANTILES} == GOLDEN_QUANTILES
    assert {k: row[k] for k in GOLDEN_HLL} == GOLDEN_HLL


def test_sketches_merge_correctly_under_repartition(spark, exact):
    """Distributed-merge property: HLL values identical at any partition
    count; quantiles stay inside the rank bound (their merge is
    order-sensitive by design, so bit-equality is NOT asserted)."""
    for parts in (7, 13):
        li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").repartition(parts)
        row = li.agg(*_approx_aggs()).collect()[0].asDict()
        assert {k: row[k] for k in GOLDEN_HLL} == GOLDEN_HLL, parts
        _assert_rank_bound(exact, row)


def test_countmin_never_underestimates(spark):
    """Count-Min guarantee: every reported estimate >= the key's exact
    count (hash collisions only ADD), and within total/CM_WIDTH per the
    single-row error bound times a small slack for the fixture."""
    from pyspark.sql import functions as F

    from snackfs_spark.operators.relational import CM_WIDTH
    from snackfs_spark.registry import load_all

    reg = load_all()
    est = {
        r["key"]: r["est_count"]
        for r in reg["heavy_hitters_countmin"].fn(spark, SF_ORACLE).collect()
    }
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    total = ev.count()
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert est, "sketch reported no keys"
    for k, e in est.items():
        assert e >= exact[k], f"under-estimate for {k}: {e} < {exact[k]}"
        assert e - exact[k] <= max(4 * total // CM_WIDTH, 8), (
            f"overshoot beyond CM bound for {k}: est {e}, exact {exact[k]}"
        )


def test_binned_quantiles_within_bin_width_of_exact(spark):
    """Sketch error contract: each binned estimate is within one bin
    width ABOVE the exact quantile (upper-edge convention)."""
    import duckdb

    from snackfs_spark.operators.relational import (
        HIST_HI,
        HIST_LO,
        QS_BINS,
    )
    from snackfs_spark.registry import load_all

    reg = load_all()
    est = {
        round(r["q"], 3): r["est_upper"]
        for r in reg["events_quantiles_binned"].fn(spark, SF_ORACLE).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/events.parquet')"
    )
    width = (HIST_HI - HIST_LO) / QS_BINS
    for q, e in est.items():
        (x,) = con.execute(
            f"SELECT quantile_disc(value, {q}) FROM events "
            f"WHERE value >= {HIST_LO} AND value < {HIST_HI}"
        ).fetchone()
        assert x <= e <= x + width + 1e-9, (q, x, e, width)
