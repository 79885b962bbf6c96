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
  analog of split planning over the token ring (§3.3). Each partition
  carries `preferred_hosts` — the RF=3 replica set from the token ring
  (owner interval + 2 clockwise successors), mirroring the reference's
  block→replica locality feed (ThriftStore.scala:543-605, consumed by
  SnackFS.scala:135-149). Spark's Python Data Source API does not yet
  consume preferred locations from Python partitions, so the hosts are
  surfaced via `SnackStoreReader.preferred_locations()` for the
  scheduler-integration layer (and asserted in tests); the planning math
  is the real thing.
- **Filter pushdown** (SupportsPushDownFilters analog, SURVEY §4):
  `path = X` prunes to ONE bucket before any IO; `path LIKE prefix%` and
  sub_offset range predicates filter inside the reader before rows reach
  Spark. Unsupported filters are returned to Spark for post-evaluation.
- **Limit pushdown** (SupportsPushDownLimit analog, SURVEY §4): a
  `limit=N` read option stops each partition after N rows (Spark applies
  the final global limit). Separately, a `listing_cap` option (default
  100000) mirrors the reference's hard listing cap, which bounds *path
  listings* only — the indexed-slice query of ThriftStore.scala:509 —
  never data reads. It therefore applies only to metadata-only reads
  (payload column not requested), and when it binds the reader raises
  rather than silently truncating (the reference surfaces the same
  bound as a query-size contract, not a lossy default).
- **Column pruning** (SupportsPushDownRequiredColumns analog, SURVEY §4:
  the reference fetches ONLY the path column in listings,
  ThriftStore.scala:506): the Python Data Source API has no
  required-columns hook yet, so a `columns` read option names the
  needed fields; when `payload` is absent the reader never opens a blob
  (lengths come from a stat call) — metadata listings over the store do
  zero content IO.
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
import warnings
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_BUCKETS = 8
LISTING_CAP = 100_000   # reference's hard listing cap (ThriftStore.scala:509)
TOKEN_SPACE = 4294967296  # 2^32 ring, same space as sources/fsmodel.py
REPLICATION = 3           # RF=3 SimpleStrategy-style replica walk

SCHEMA = (
    "path string, sub_offset bigint, length bigint, payload string"
)


def _bucket_of(path: str, buckets: int) -> int:
    return int(hashlib.md5(path.encode()).hexdigest()[:8], 16) % buckets


def _path_hash(path: str) -> str:
    return hashlib.md5(path.encode()).hexdigest()[:16]


def bucket_replicas(bucket: int, buckets: int, hosts: list[str]) -> tuple[str, ...]:
    """Replica hosts for one bucket: place the bucket's midpoint token on
    the ring (equal ranges per host, wraparound at the top, exactly the
    fsmodel ring layout), owner = containing range, replicas = owner + the
    next RF-1 hosts clockwise — Cassandra SimpleStrategy, the locality
    walk of ThriftStore.scala:543-605."""
    if not hosts:
        return ()
    token = (bucket * TOKEN_SPACE + TOKEN_SPACE // 2) // max(buckets, 1)
    step = TOKEN_SPACE // len(hosts)
    # Range i covers (i*step, (i+1)*step] with the last range wrapping to 0:
    # owner index = ceil(token/step) - 1 (mod n).
    owner = ((token + step - 1) // step - 1) % len(hosts)
    return tuple(hosts[(owner + r) % len(hosts)] for r in range(min(REPLICATION, len(hosts))))


@dataclass
class _BucketPartition(InputPartition):
    bucket: int
    preferred_hosts: tuple[str, ...] = ()


class SnackStoreReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.root = options.get("store_dir")
        if not self.root:
            raise ValueError("snackstore requires option 'store_dir'")
        with open(os.path.join(self.root, "_store.json")) as f:
            meta = json.load(f)
        self.buckets = meta["buckets"]
        self.hosts: list[str] = meta.get("hosts", [])
        self.eq_path: str | None = None
        self.prefix: str | None = None
        # SupportsPushDownLimit analog: per-partition row cap (Spark
        # applies the final global limit, so truncation here is the
        # *requested* semantics, never lossy).
        limit = options.get("limit")
        self.limit: int | None = int(limit) if limit is not None else None
        # SupportsPushDownRequiredColumns analog: a metadata-only read
        # ('payload' not requested) never opens blobs.
        cols = options.get("columns")
        self.want_payload = cols is None or "payload" in {
            c.strip() for c in cols.split(",")
        }
        # The reference's 100k listing bound (ThriftStore.scala:509)
        # applies to path listings only, never data reads: enforce it
        # only on metadata-only scans, and fail loudly when it binds
        # (a silently truncated listing looks complete downstream).
        self.listing_cap = int(options.get("listing_cap", LISTING_CAP))

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
            b = _bucket_of(self.eq_path, self.buckets)
            return [_BucketPartition(b, bucket_replicas(b, self.buckets, self.hosts))]
        return [
            _BucketPartition(b, bucket_replicas(b, self.buckets, self.hosts))
            for b in range(self.buckets)
        ]

    def preferred_locations(self) -> dict[int, tuple[str, ...]]:
        """bucket -> replica hosts, the preferredLocations feed the JVM
        scheduler would consume (SnackFS.scala:135-149 getFileBlockLocations)."""
        return {p.bucket: p.preferred_hosts for p in self.partitions()}

    def read(self, partition: _BucketPartition):
        bdir = os.path.join(self.root, f"bucket={partition.bucket}")
        if not os.path.isdir(bdir):
            return
        # Merge inode fragments ADDITIVELY: a path's chunks may span
        # several write tasks (repartitioned input, append jobs), so each
        # fragment contributes offsets; dict.update would silently drop
        # all but the last fragment's list.
        chunks: dict[str, dict[int, int | None]] = {}
        for fn in sorted(os.listdir(bdir)):
            if fn.startswith("inodes-"):
                with open(os.path.join(bdir, fn)) as f:
                    for path, meta in json.load(f).items():
                        ent = chunks.setdefault(path, {})
                        for off, length in meta.get("chunks", []):
                            ent[off] = length
                        for off in meta.get("offsets", []):  # pre-r2 stores
                            ent.setdefault(off, None)
        emitted = 0
        for path in sorted(chunks):
            if self.eq_path is not None and path != self.eq_path:
                continue
            if self.prefix is not None and not path.startswith(self.prefix):
                continue
            ph = _path_hash(path)
            for off in sorted(chunks[path]):
                if self.limit is not None and emitted >= self.limit:
                    return  # pushed-down LIMIT: truncation is requested
                if not self.want_payload and emitted >= self.listing_cap:
                    raise RuntimeError(
                        f"snackstore listing exceeds listing_cap="
                        f"{self.listing_cap} rows in bucket "
                        f"{partition.bucket}; raise the 'listing_cap' "
                        "read option or push a narrower path filter "
                        "(reference bound: ThriftStore.scala:509)"
                    )
                blob = os.path.join(bdir, f"sblock-{ph}-{off}.bin")
                if self.want_payload:
                    with open(blob, "rb") as f:
                        payload = f.read().decode("utf-8")
                    yield (path, off, len(payload), payload)
                else:
                    # metadata-only: the length comes from the inode
                    # record; pre-r2 stores lack it, fall back to a stat
                    # (== char length only for ascii payloads)
                    length = chunks[path][off]
                    if length is None:
                        length = os.path.getsize(blob)
                    yield (path, off, length, None)
                emitted += 1


class SnackStoreWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = False):
        self.root = options.get("store_dir")
        if not self.root:
            raise ValueError("snackstore requires option 'store_dir'")
        meta_path = os.path.join(self.root, "_store.json")
        if overwrite and os.path.isdir(self.root):
            # mode("overwrite") clears every bucket dir; without this the
            # old fragments would silently survive under the new store.
            import shutil  # noqa: PLC0415

            for fn in os.listdir(self.root):
                if fn.startswith("bucket="):
                    shutil.rmtree(os.path.join(self.root, fn))
        if not overwrite and os.path.exists(meta_path):
            # Appending to an existing store: the bucket count is part of
            # the physical layout (blobs already hash to it) — reuse the
            # recorded metadata, and refuse a conflicting explicit
            # `buckets` option (writing with a different count would
            # route new fragments to buckets old readers never visit:
            # silent data loss). Same for hosts — an append must not
            # wipe the ring.
            with open(meta_path) as f:
                existing = json.load(f)
            self.buckets = existing["buckets"]
            self.hosts = existing.get("hosts", [])
            opt_buckets = options.get("buckets")
            if opt_buckets is not None and int(opt_buckets) != self.buckets:
                raise ValueError(
                    f"append with buckets={opt_buckets} conflicts with "
                    f"existing store layout buckets={self.buckets}; "
                    "use mode('overwrite') to re-bucket"
                )
        else:
            self.buckets = int(options.get("buckets", DEFAULT_BUCKETS))
            hosts_opt = options.get("hosts")
            self.hosts = hosts_opt.split(",") if hosts_opt else []
            os.makedirs(self.root, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump({"buckets": self.buckets, "hosts": self.hosts}, f)

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
            ent = inodes.setdefault(b, {}).setdefault(path, {"chunks": []})
            # (offset, char length) in the inode record, so metadata-only
            # reads never touch blobs (the reference's listing pattern)
            ent["chunks"].append([off, len(payload)])
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


class SnackStoreTailReader(SimpleDataSourceStreamReader):
    """Streaming tail-follow of ONE store path — the reference's
    tail/follow stream surface (fs/stream sequential readers;
    `snackfs -tail -f`, SnackFSShell.scala) as a Structured Streaming
    source. The offset is the CONTIGUOUSLY-consumed char position
    (`{"end": N}`): a micro-batch emits committed sub-blocks starting
    exactly at N, advancing through each one, and STOPS at the first
    gap — sequential-read semantics, you cannot tail past a hole.

    Contiguity is what makes the offset safe under concurrent append
    tasks: a multi-task append commits its inode fragments in arbitrary
    order, so a later-offset fragment can become visible before an
    earlier one. A max-visible-offset watermark would jump past the
    missing range and lose it forever; the contiguous walk simply leaves
    the out-of-order tail pending until the gap commits, then emits both
    in order. Replay stays exact: blobs are immutable once committed, so
    the chunk run covering [start.end, end.end) never changes —
    `readBetweenOffsets` re-derives it from the store, which is what
    makes checkpoint recovery exactly-once without a WAL. A blob whose
    task died before its inode fragment landed is invisible here for the
    same reason it is invisible to batch readers (commit protocol).

    At scale the same design follows a DIRECTORY (offset = per-path
    consumed-position map, one partition per bucket); the single-path
    form is the reference's actual tail semantics and keeps the offset
    O(1)."""

    def __init__(self, options):
        self.root = options.get("store_dir")
        self.path = options.get("path")
        if not self.root or not self.path:
            raise ValueError("snackstore stream requires 'store_dir' and 'path'")
        with open(os.path.join(self.root, "_store.json")) as f:
            self.buckets = json.load(f)["buckets"]
        self.bdir = os.path.join(
            self.root, f"bucket={_bucket_of(self.path, self.buckets)}"
        )
        # sub_offset -> decoded char length for pre-r2 length-less
        # fragments. Blobs are immutable once committed, so entries never
        # invalidate; without this every micro-batch poll re-decodes the
        # whole legacy payload just to measure it (r4 ADVICE).
        self._legacy_len_cache: dict[int, int] = {}

    def initialOffset(self) -> dict:
        return {"end": 0}  # follow from the start of the file

    def _committed_chunks(self) -> list[tuple[int, int]]:
        """Sorted (sub_offset, length) pairs of the path visible under
        the commit protocol (listed from inode fragments, never by
        globbing blobs). Pre-r2 fragments lack lengths — stat the blob."""
        chunks: dict[int, int | None] = {}
        if not os.path.isdir(self.bdir):
            return []
        for fn in sorted(os.listdir(self.bdir)):
            if fn.startswith("inodes-"):
                with open(os.path.join(self.bdir, fn)) as f:
                    meta = json.load(f).get(self.path)
                if meta:
                    for off, length in meta.get("chunks", []):
                        chunks[off] = length
                    for off in meta.get("offsets", []):
                        chunks.setdefault(off, None)
        ph = _path_hash(self.path)
        out = []
        for off in sorted(chunks):
            length = chunks[off]
            if length is None:
                # pre-r2 fragments lack lengths; the contiguity walk
                # needs CHAR length (offsets are char positions), so
                # decode — getsize would return bytes and a multi-byte
                # payload would open a phantom gap that stalls the
                # stream forever. Decode once per chunk, not per poll:
                # blobs are immutable once committed.
                length = self._legacy_len_cache.get(off)
                if length is None:
                    with open(
                        os.path.join(self.bdir, f"sblock-{ph}-{off}.bin"), "rb"
                    ) as f:
                        length = len(f.read().decode("utf-8"))
                    self._legacy_len_cache[off] = length
            out.append((off, length))
        return out

    def _pos(self, offset: dict) -> int:
        """Consumed position from an offset dict, accepting the legacy
        {"hwm": N} form (pre-contiguity checkpoints): old hwm = max
        EMITTED sub_offset, so the consumed position is that chunk's
        end (the old reader had emitted everything visible <= hwm)."""
        if "end" in offset:
            return offset["end"]
        hwm = offset["hwm"]
        if hwm < 0:
            return 0
        chunks = self._committed_chunks()
        for off, length in chunks:
            if off == hwm:
                return off + length
        # The hwm chunk vanished (vacuumed legacy checkpoint). hwm is a
        # chunk START, not a consumed end — returning it raw would make
        # the next committed chunk (at hwm + len) look like a permanent
        # gap and stall the stream. The legacy reader had emitted
        # everything visible <= hwm, so resume from the END of the last
        # surviving chunk at-or-below hwm; if none survive, from the
        # next chunk's start (r4 ADVICE).
        below = [(off, length) for off, length in chunks if off <= hwm]
        pos = below[-1][0] + below[-1][1] if below else 0
        if not any(off == pos for off, _length in chunks):
            # the run following pos was vacuumed too; data in the hole is
            # unrecoverable, so skip to the next surviving chunk rather
            # than stalling on a gap that can never fill
            later = [off for off, _length in chunks if off > pos]
            if later:
                pos = later[0]
        warnings.warn(
            f"snackstore tail {self.path}: legacy hwm {hwm} chunk was "
            f"vacuumed; degraded recovery resumes at position {pos}",
            stacklevel=2,
        )
        return pos

    def _rows(self, chunks: list[tuple[int, int]], lo: int, hi: int):
        """Rows for the given committed chunks with lo <= sub_offset < hi."""
        ph = _path_hash(self.path)
        for off, _length in chunks:
            if lo <= off < hi:
                with open(
                    os.path.join(self.bdir, f"sblock-{ph}-{off}.bin"), "rb"
                ) as f:
                    payload = f.read().decode("utf-8")
                yield (self.path, off, len(payload), payload)

    def read(self, start: dict):
        # one fragment listing per micro-batch: advance through the
        # contiguous committed run starting at the consumed position,
        # stopping at the first gap
        chunks = self._committed_chunks()
        start_pos = self._pos(start)
        end_pos = start_pos
        for off, length in chunks:
            if off < end_pos:
                continue  # already consumed
            if off > end_pos:
                break  # gap — out-of-order commit still pending
            end_pos = off + length
        # a list_iterator, not a generator: the engine caches the batch
        # for replay-until-commit via copy.copy, which generators refuse
        return iter(list(self._rows(chunks, start_pos, end_pos))), {
            "end": end_pos
        }

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            list(
                self._rows(
                    self._committed_chunks(), self._pos(start), self._pos(end)
                )
            )
        )


class SnackStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snackstore"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> SnackStoreReader:
        return SnackStoreReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> SnackStoreWriter:
        return SnackStoreWriter(self.options, overwrite=overwrite)

    def simpleStreamReader(self, schema: StructType) -> SnackStoreTailReader:
        return SnackStoreTailReader(self.options)


VACUUM_GRACE_SECONDS = 600.0


def vacuum_store(root: str, grace_seconds: float = VACUUM_GRACE_SECONDS) -> dict[str, int]:
    """Garbage-collect orphan blobs: a write task that died after writing
    sblock files but before its inode fragment leaves unreferenced blobs
    on disk (the commit protocol makes them invisible to readers, but
    they consume space). Walk each bucket, collect every (path-hash,
    offset) the inode records reference, delete the rest — the connector
    analog of Cassandra's compaction/GC of dead sblock columns
    (reference thresholds: ThriftStore.scala:229-234).

    Safe to run concurrently with readers (referenced blobs are never
    touched) AND with in-flight writers: write() creates sblock blobs
    *before* the task's inode fragment lands, so a blob that merely
    looks orphaned may be seconds from being referenced. Only blobs
    older than `grace_seconds` (mtime threshold — the gc_grace analog
    of Cassandra's tombstone GC) are deleted; pass grace_seconds=0 only
    when all writers are known quiesced."""
    import time  # noqa: PLC0415

    cutoff = time.time() - grace_seconds
    removed = kept = 0
    for fn in os.listdir(root):
        if not fn.startswith("bucket="):
            continue
        bdir = os.path.join(root, fn)
        referenced: set[str] = set()
        for f in os.listdir(bdir):
            if f.startswith("inodes-"):
                with open(os.path.join(bdir, f)) as fh:
                    for path, meta in json.load(fh).items():
                        ph = _path_hash(path)
                        offs = [c[0] for c in meta.get("chunks", [])]
                        offs += list(meta.get("offsets", []))
                        referenced.update(f"sblock-{ph}-{o}.bin" for o in offs)
        for f in os.listdir(bdir):
            if f.startswith("sblock-"):
                fp = os.path.join(bdir, f)
                if f in referenced or os.path.getmtime(fp) > cutoff:
                    kept += 1
                else:
                    os.unlink(fp)
                    removed += 1
    return {"removed": removed, "kept": kept}


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
        hosts = [
            r["host"]
            for r in fsmodel.ring_df(spark, sf_dir).orderBy("tok_start").collect()
        ]
        (
            chunks.write.format("snackstore")
            .option("store_dir", root)
            .option("buckets", DEFAULT_BUCKETS)
            .option("hosts", ",".join(hosts))
            .mode("append")
            .save()
        )
    else:
        register(spark)
    return root
