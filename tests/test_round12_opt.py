"""Round-12 optimization tests: build-inclusive bench billing (r11
VERDICT #1) and the round's operator-internals changes."""

from __future__ import annotations

from snackfs_spark import memo
from tests.conftest import SF_ORACLE


def test_memo_build_counter_bills_first_toucher_once(spark):
    """The SessionMemo build counter advances exactly when a shared
    pipeline is CONSTRUCTED (cache miss) and never on a warm read — the
    property bench.py's first-toucher billing rests on."""
    from snackfs_spark.operators import dedup

    memo.clear_all_memos()
    pre = memo.build_count()
    dedup.distinct_shingles_df(spark, SF_ORACLE)
    mid = memo.build_count()
    assert mid > pre, "first toucher must register >= 1 memo build"
    dedup.distinct_shingles_df(spark, SF_ORACLE)
    assert memo.build_count() == mid, "warm read must bill zero builds"


def test_memo_materialize_policy(spark, tmp_path, monkeypatch):
    """SNACKFS_MEMO_MATERIALIZE selects how corpus-proportional shared
    relations materialize (r11 VERDICT #3): local (default), reliable
    (durable checkpoint dir), none (keep lineage). All value-identical."""
    import pytest

    df = spark.range(10).withColumnRenamed("id", "x")
    monkeypatch.delenv("SNACKFS_MEMO_MATERIALIZE", raising=False)
    out_local = memo.materialize_shared(df, spark)
    assert sorted(r.x for r in out_local.collect()) == list(range(10))

    monkeypatch.setenv("SNACKFS_MEMO_MATERIALIZE", "none")
    assert memo.materialize_shared(df, spark) is df

    monkeypatch.setenv("SNACKFS_MEMO_MATERIALIZE", "reliable")
    monkeypatch.setenv("SNACKFS_CHECKPOINT_DIR", str(tmp_path / "ck"))
    out_rel = memo.materialize_shared(df, spark)
    assert sorted(r.x for r in out_rel.collect()) == list(range(10))
    assert spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()

    monkeypatch.setenv("SNACKFS_MEMO_MATERIALIZE", "bogus")
    with pytest.raises(ValueError):
        memo.materialize_shared(df, spark)


def test_build_counter_is_monotone_and_clear_safe():
    """clear_all_memos drops cached pipelines but never rewinds the
    build counter (a rewind would let a bench rep un-bill a build)."""
    pre = memo.build_count()
    m = memo.SessionMemo(maxsize=2)
    m.get_or_build(("app", "k1"), lambda: object())
    assert memo.build_count() == pre + 1
    m.get_or_build(("app", "k1"), lambda: object())
    assert memo.build_count() == pre + 1
    memo.clear_all_memos()
    assert memo.build_count() == pre + 1
    m.get_or_build(("app", "k1"), lambda: object())
    assert memo.build_count() == pre + 2
