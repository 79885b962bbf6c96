"""Sampling/packing operator tests beyond the registered oracle battery:
shard-count parameterization of sequence packing (VERDICT r2 #4)."""

from __future__ import annotations

import pytest

from snackfs_spark.operators.sampling import (
    PACK_SHARDS,
    pack_oracle_sql,
    pack_sequences_sharded,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


@pytest.mark.parametrize("shards", [4, 32])
def test_pack_sequences_green_at_any_shard_count(spark, duck, shards):
    """Packing must be deterministic and oracle-exact at ANY shard count
    — the shard count is the scale-out knob (defaultParallelism on a
    real cluster), so correctness can't depend on its value."""
    assert shards != PACK_SHARDS  # the registered count is already gated
    sdf = pack_sequences_sharded(spark, SF_ORACLE, shards=shards).toPandas()
    odf = duck.execute(pack_oracle_sql(shards)).fetchdf()
    assert compare(sdf, odf) == []
    assert sdf["shard"].nunique() == shards


def test_pack_sequences_defaults_to_parallelism(spark):
    """With no explicit count, sharding tracks defaultParallelism — the
    docstring's '1000-executor scale unit' claim is the actual default."""
    df = pack_sequences_sharded(spark, SF_ORACLE)
    n = df.select("shard").distinct().count()
    assert n == spark.sparkContext.defaultParallelism


def test_dsir_selection_skews_toward_target_lang(spark):
    """The DSIR affinity score must actually steer selection: the
    selected set's target-language share must strictly exceed the
    corpus base rate (the statistic is useless if it doesn't)."""
    from snackfs_spark.operators.sampling import DSIR_TARGET_LANG
    from snackfs_spark.registry import load_all
    from snackfs_spark.sources.tables import load_table

    sel = load_all()["importance_sample_dsir"].fn(spark, SF_ORACLE).toPandas()
    sel_rate = (sel["lang"] == DSIR_TARGET_LANG).mean()
    docs = load_table(spark, SF_ORACLE, "documents").select("lang").toPandas()
    base_rate = (docs["lang"] == DSIR_TARGET_LANG).mean()
    assert sel_rate > base_rate + 0.25, (sel_rate, base_rate)


def test_bloom_prefilter_never_drops_members(spark):
    """The declarative bloom pre-filter admits every true member (false
    negatives impossible — exactly the property that lets it precede an
    exact join without an oracle change) and rejects most non-members."""
    from pyspark.sql import functions as F

    from snackfs_spark.operators.sampling import bloom_bitmap, bloom_prefilter

    keys = spark.range(0, 2000).select(
        (F.col("id") % 500).alias("k").cast("string").alias("key")
    )
    bitmap = bloom_bitmap(keys, "key", nbits=1 << 16)
    probe = spark.range(0, 5000).select(F.col("id").cast("string").alias("key"))
    kept = {r["key"] for r in bloom_prefilter(probe, "key", bitmap, nbits=1 << 16).collect()}
    members = {str(i) for i in range(500)}
    assert members <= kept  # zero false negatives
    fp = (len(kept) - len(members)) / (5000 - len(members))
    assert fp < 0.25, f"false-positive rate {fp:.2f} out of spec for 2n/m load"
