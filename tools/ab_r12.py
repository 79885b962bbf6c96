"""Round-12 A/B probes (VERDICT #6/#7): checkpointed-pair PCY variant
and the two-phase table_profile variant, timed in ONE session against
the registered shapes, interleaved A/B/A/B.

Usage: python tools/ab_r12.py [pcy|profile|all] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from snackfs_spark.registry import load_all  # noqa: E402
from snackfs_spark.session import get_spark  # noqa: E402
from snackfs_spark.sources import tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(label, fn, spark, reps):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - t0)
    print(f"{label}: best {min(samples):.3f}s  ({' '.join(f'{s:.3f}' for s in samples)})")
    return min(samples)


def pcy_checkpointed(spark, sf_dir):
    """basket_pairs_pcy with the PAIR relation checkpointed instead of
    regenerated (VERDICT #6 re-measure)."""
    from snackfs_spark.functions import md5_fp
    from snackfs_spark.operators.mining import (
        PCY_LOAD_DIV,
        PCY_MINSUP_DENOM,
        basket_items_df,
    )

    li = basket_items_df(spark, sf_dir)
    ms = li.agg(
        F.greatest(
            F.lit(3).cast("long"),
            F.expr(f"count(distinct l_orderkey) div {PCY_MINSUP_DENOM}"),
        ).alias("minsup")
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("support"))
    freq = (
        item.crossJoin(F.broadcast(ms))
        .filter(F.col("support") >= F.col("minsup"))
        .select("l_partkey")
    )
    b = li.join(freq.hint("shuffle_hash"), "l_partkey")
    nb = (
        b.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.sum(F.expr("sz * (sz - 1) div 2")).alias("total_pairs"))
        .crossJoin(F.broadcast(ms))
        .select(
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"({PCY_LOAD_DIV} * total_pairs) div minsup"),
            ).alias("nbuckets"),
            "minsup",
        )
    )
    x = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    y = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pair_key = F.concat_ws(
        "|", F.col("part_a").cast("string"), F.col("part_b").cast("string")
    )
    pw = (
        x.join(y, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .crossJoin(F.broadcast(nb))
        .withColumn("bucket", md5_fp(pair_key) % F.col("nbuckets"))
        .select("part_a", "part_b", "bucket", "minsup")
        .localCheckpoint(eager=False)  # <-- the variant under test
    )
    hot = (
        pw.groupBy("bucket", "minsup")
        .agg(F.count(F.lit(1)).alias("bc"))
        .filter(F.col("bc") >= F.col("minsup"))
        .select("bucket")
    )
    return (
        pw.join(hot, "bucket", "left_semi")
        .groupBy("part_a", "part_b", "minsup")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= F.col("minsup"))
        .select("part_a", "part_b", "pair_support")
    )


def profile_twophase(spark, sf_dir):
    """table_profile with per-column two-phase distinct aggregates
    (pre-dedup narrow projections, then count) unioned — VERDICT #7's
    alternative to the single multi-distinct Expand plan."""
    from snackfs_spark.operators.relational import PROFILE_COLS
    from snackfs_spark.sources.tables import load_table

    import os as _os

    li = load_table(spark, sf_dir, "lineitem")
    if _os.environ.get("AB_PROFILE_CKPT", "0") == "1":
        li = li.localCheckpoint(eager=False)
    base = li.agg(
        *[a for c in PROFILE_COLS for a in (
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        )]
    )
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__min, {c}__max" for c in PROFILE_COLS
    )
    narrow = base.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_rows, n_null, min_val, max_val)"
    )
    dist = None
    for c in PROFILE_COLS:
        d = (
            li.select(c).where(F.col(c).isNotNull()).distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
            .select(F.lit(c).alias("column_name"), "n_distinct")
        )
        dist = d if dist is None else dist.unionByName(d)
    return narrow.join(F.broadcast(dist), "column_name").select(
        "column_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val"
    )


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    reg = load_all()
    spark = get_spark("ab_r12", cpus=32)
    tables.build_ingest_cache(spark, SF_DIR)
    reg["q6_revenue_forecast"].fn(spark, SF_DIR).collect()

    if what in ("pcy", "all"):
        for rnd in range(2):
            timeit(f"pcy_current[{rnd}]", lambda: reg["basket_pairs_pcy"].fn(spark, SF_DIR), spark, reps)
            timeit(f"pcy_checkpointed[{rnd}]", lambda: pcy_checkpointed(spark, SF_DIR), spark, reps)
    if what in ("profile", "all"):
        # sanity: same rows
        cur = {tuple(r) for r in reg["table_profile"].fn(spark, SF_DIR).collect()}
        new = {tuple(r) for r in profile_twophase(spark, SF_DIR).collect()}
        print("profile rows equal:", cur == new)
        for rnd in range(2):
            timeit(f"profile_expand[{rnd}]", lambda: reg["table_profile"].fn(spark, SF_DIR), spark, reps)
            timeit(f"profile_twophase[{rnd}]", lambda: profile_twophase(spark, SF_DIR), spark, reps)
    spark.stop()


if __name__ == "__main__":
    main()
