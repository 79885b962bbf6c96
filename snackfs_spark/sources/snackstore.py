"""snackstore: a custom Spark data source (Python Data Source API — the
DSv2 equivalent) backing the filesystem model with a Cassandra-style
key-value layout — the north star's "custom Cassandra-backed FileSystem"
connector (SURVEY.md §7 M6), re-expressed over Spark 4's connector API.

Layout mirrors the reference's storage schema (ThriftStore.scala:228-241):

    store_dir/
      _store.json                    # {"buckets": N}   (keyspace def)
      bucket=<k>/
        inodes-<task>.json           # inode CF: path -> {size, parent_path}
        sblock-<pathhash>-<sub_offset>.bin   # sblock CF: one blob per sub-block

- **Key dispersion**: bucket = md5(path) % buckets — the reference's
  path-hash row key (ThriftStore.scala:243-247 getPathKey).
- **Partition planning**: one InputPartition per bucket, the connector
  analog of split planning over the token ring (§3.3; preferredLocations
  would attach here on a real cluster).
- **Filter pushdown** (SupportsPushDownFilters analog, SURVEY §4):
  `path = X` prunes to ONE bucket before any IO; `path LIKE prefix%` and
  sub_offset range predicates filter inside the reader before rows reach
  Spark. Unsupported filters are returned to Spark for post-evaluation.
- **Writes**: each task writes blobs + a task-unique inode fragment into
  its buckets (no commit coordination needed — filenames are unique, the
  reader unions fragments), mirroring the reference's per-sub-block
  inserts (ThriftStore.scala:352-365) but parallel per partition.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_BUCKETS = 8

SCHEMA = (
    "path string, sub_offset bigint, length bigint, payload string"
)


def _bucket_of(path: str, buckets: int) -> int:
    return int(hashlib.md5(path.encode()).hexdigest()[:8], 16) % buckets


def _path_hash(path: str) -> str:
    return hashlib.md5(path.encode()).hexdigest()[:16]


@dataclass
class _BucketPartition(InputPartition):
    bucket: int


class SnackStoreReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.root = options.get("store_dir")
        if not self.root:
            raise ValueError("snackstore requires option 'store_dir'")
        with open(os.path.join(self.root, "_store.json")) as f:
            self.buckets = json.load(f)["buckets"]
        self.eq_path: str | None = None
        self.prefix: str | None = None

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("path",):
                self.eq_path = f.value
            elif isinstance(f, StringStartsWith) and f.attribute == ("path",):
                self.prefix = f.value
            else:
                yield f  # unsupported -> Spark evaluates it post-scan

    def partitions(self):
        if self.eq_path is not None:
            # point lookup touches exactly one bucket (getPathKey dispersion)
            return [_BucketPartition(_bucket_of(self.eq_path, self.buckets))]
        return [_BucketPartition(b) for b in range(self.buckets)]

    def read(self, partition: _BucketPartition):
        bdir = os.path.join(self.root, f"bucket={partition.bucket}")
        if not os.path.isdir(bdir):
            return
        inodes: dict[str, dict] = {}
        for fn in os.listdir(bdir):
            if fn.startswith("inodes-"):
                with open(os.path.join(bdir, fn)) as f:
                    inodes.update(json.load(f))
        for path, meta in inodes.items():
            if self.eq_path is not None and path != self.eq_path:
                continue
            if self.prefix is not None and not path.startswith(self.prefix):
                continue
            ph = _path_hash(path)
            for off in meta["offsets"]:
                blob = os.path.join(bdir, f"sblock-{ph}-{off}.bin")
                with open(blob, "rb") as f:
                    payload = f.read().decode("utf-8")
                yield (path, off, len(payload), payload)


class SnackStoreWriter(DataSourceWriter):
    def __init__(self, options):
        self.root = options.get("store_dir")
        if not self.root:
            raise ValueError("snackstore requires option 'store_dir'")
        self.buckets = int(options.get("buckets", DEFAULT_BUCKETS))
        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "_store.json"), "w") as f:
            json.dump({"buckets": self.buckets}, f)

    def write(self, rows):
        task = uuid.uuid4().hex[:12]
        inodes: dict[int, dict[str, dict]] = {}
        for row in rows:
            path, off, _length, payload = row[0], row[1], row[2], row[3]
            b = _bucket_of(path, self.buckets)
            bdir = os.path.join(self.root, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            ph = _path_hash(path)
            with open(os.path.join(bdir, f"sblock-{ph}-{off}.bin"), "wb") as f:
                f.write(payload.encode("utf-8"))
            ent = inodes.setdefault(b, {}).setdefault(path, {"offsets": []})
            ent["offsets"].append(off)
        for b, m in inodes.items():
            with open(
                os.path.join(self.root, f"bucket={b}", f"inodes-{task}.json"), "w"
            ) as f:
                json.dump(m, f)
        return WriterCommitMessage()

    def commit(self, messages):
        # all task outputs are uniquely named; nothing to reconcile —
        # the single-commit contract the reference lacks (it re-upserts
        # the INode per block) comes free here
        return None

    def abort(self, messages):
        return None


class SnackStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snackstore"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> SnackStoreReader:
        return SnackStoreReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> SnackStoreWriter:
        return SnackStoreWriter(self.options)


def register(spark) -> None:
    # pushFilters requires the runtime flag; set it here so the connector
    # works on any session handed to us (it is a plain SQL conf)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnackStoreDataSource)


def store_for(spark, sf_dir: str) -> str:
    """Materialize (once per dataset) a snackstore holding the documents
    content model, under var/. Subsequent calls reuse the store — the
    connector then serves reads exactly like the Cassandra sblock CF."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from snackfs_spark.sources import fsmodel  # noqa: PLC0415

    tag = sf_dir.strip("/").replace("/", "_")
    root = f"/root/repo/var/snackstore_{tag}"
    marker = os.path.join(root, "_store.json")
    if not os.path.exists(marker):
        register(spark)
        chunks = fsmodel.content_df(spark, sf_dir).select(
            "path", "sub_offset", "length", "payload"
        )
        (
            chunks.write.format("snackstore")
            .option("store_dir", root)
            .option("buckets", DEFAULT_BUCKETS)
            .mode("append")
            .save()
        )
    else:
        register(spark)
    return root
