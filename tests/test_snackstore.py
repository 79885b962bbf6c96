"""snackstore connector tests: write/read roundtrip through the custom
data source, bucket pruning on point lookups, pushed prefix filters."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from snackfs_spark.sources import snackstore, writer

VAR = Path("/root/repo/var/test_snackstore")


@pytest.fixture(scope="module", autouse=True)
def store(spark):
    shutil.rmtree(VAR, ignore_errors=True)
    VAR.mkdir(parents=True, exist_ok=True)
    snackstore.register(spark)
    rows = [
        ("/kv/a.txt", "alpha " * 30),
        ("/kv/b.txt", "bravo " * 100),
        ("/kv/sub/c.txt", "charlie"),
        ("/other/d.txt", "delta " * 50),
    ]
    df = spark.createDataFrame(rows, "path string, text string")
    chunks = writer.chunk_text(df).select("path", "sub_offset", "length", "payload")
    (
        chunks.write.format("snackstore")
        .option("store_dir", str(VAR / "store"))
        .option("buckets", 8)
        .mode("append")
        .save()
    )
    yield {p: t for p, t in rows}
    shutil.rmtree(VAR, ignore_errors=True)


def _read(spark):
    return (
        spark.read.format("snackstore")
        .option("store_dir", str(VAR / "store"))
        .load()
    )


def test_roundtrip_through_connector(spark, store):
    got = {
        r["path"]: r["text"]
        for r in _read(spark)
        .groupBy("path")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("sub_offset", "payload"))),
                    lambda s: s.getField("payload"),
                ),
                "",
            ).alias("text")
        )
        .collect()
    }
    assert got == store


def test_point_lookup_prunes_to_one_bucket(spark, store):
    df = _read(spark).filter(F.col("path") == "/kv/b.txt")
    # the pushed EqualTo collapses partition planning to a single bucket
    assert df.rdd.getNumPartitions() == 1
    rows = df.collect()
    assert rows and all(r["path"] == "/kv/b.txt" for r in rows)
    assert "".join(
        r["payload"] for r in sorted(rows, key=lambda r: r["sub_offset"])
    ) == store["/kv/b.txt"]
    # unfiltered scan plans all 8 buckets
    assert _read(spark).rdd.getNumPartitions() == 8


def test_prefix_filter_pushed_into_reader(spark, store):
    df = _read(spark).filter(F.col("path").startswith("/kv/"))
    paths = {r["path"] for r in df.select("path").distinct().collect()}
    assert paths == {"/kv/a.txt", "/kv/b.txt", "/kv/sub/c.txt"}


def test_unsupported_filter_still_correct(spark, store):
    # sub_offset predicate is NOT pushed (yielded back) — Spark must
    # evaluate it post-scan with identical results
    df = _read(spark).filter((F.col("sub_offset") >= 64) & (F.col("path") == "/kv/b.txt"))
    rows = df.collect()
    assert rows and all(r["sub_offset"] >= 64 and r["path"] == "/kv/b.txt" for r in rows)
