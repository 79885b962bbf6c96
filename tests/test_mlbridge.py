"""Stock-primitive parity bridge: SURVEY.md §2.C lists
pyspark.ml.feature MinHashLSH / approxSimilarityJoin as the Spark
primitive for near-dup joins. This engine hand-rolls MinHash+LSH
instead (operators/dedup.py) because the correctness gate needs both
engines to derive identical signatures — MLlib's hash coefficients are
JVM-random (seeded, but not reproducible in DuckDB), so the stock
primitive can only ever be rows-only checked.

This test keeps the bridge honest: on the small fixture, BOTH the
stock approxSimilarityJoin and the hand-rolled band join must recover
the exact-Jaccard ground truth pairs — capability parity, while only
the hand-rolled form is oracle-checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

from snackfs_spark.registry import load_all
from tests.conftest import SF_SMALL

REG = load_all()
JACCARD_T = 0.7


def _truth_pairs(spark):
    """Exact-Jaccard ground truth over 3-gram shingle sets."""
    from snackfs_spark.operators.dedup import shingles_df

    sets = (
        shingles_df(spark, SF_SMALL, distinct=False)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    a = sets.select(F.col("doc_id").alias("a"), F.col("sh").alias("sa"))
    b = sets.select(F.col("doc_id").alias("b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter / (F.size("sa") + F.size("sb") - inter)
    return {
        (r["a"], r["b"])
        for r in a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .filter(jac >= JACCARD_T)
        .collect()
    }


def test_stock_minhashlsh_and_handrolled_bands_agree_on_truth(spark):
    truth = _truth_pairs(spark)
    assert truth, "fixture corpus must contain near-dup pairs"

    # hand-rolled: oracle-checked band join candidates
    ours = {
        (r["doc_a"], r["doc_b"])
        for r in REG["dedup_minhash_lsh"].fn(spark, SF_SMALL).collect()
    }
    assert truth <= ours, f"hand-rolled bands missed {truth - ours}"

    # stock pyspark.ml.feature path on the same shingle sets
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from snackfs_spark.operators.dedup import shingles_df

    docs = (
        shingles_df(spark, SF_SMALL, distinct=False)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - JACCARD_T + 1e-9, "dist")
    stock = {
        (r["a"], r["b"])
        for r in joined.select(
            F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .collect()
    }
    # The stock join is PROBABILISTIC (8 OR-ed hash tables: a J=0.7
    # pair misses with p ~= 0.3^8, plus HashingTF bucket collisions can
    # shift hashed Jaccard across the distance cut), so exact
    # containment would be deterministic-flaky under fixture or hash
    # version changes — assert high recall, not perfection.
    recall = len(truth & stock) / len(truth)
    assert recall >= 0.9, f"stock MinHashLSH recall {recall}: missed {truth - stock}"
