"""Bounded, thread-safe per-session memo for shared lazy pipelines.

Several operator families (the MinHash candidate graph in dedup.py, the
BM25 ranking relations in textstats.py) memoize a localCheckpointed
DataFrame pipeline per (applicationId, sf_dir) so a bench session pays
the expensive scan once. The raw module-level dict version had two
defects (r8 ADVICE):

  1. unbounded growth — a long-lived session touching many sf_dirs
     retained checkpointed RDD references for the process lifetime;
  2. a first-population race — two concurrent first calls could both
     build the pipeline, leaking the losing checkpoint.

``SessionMemo`` fixes both: an LRU bounded at ``maxsize`` keys (evicted
entries simply drop their DataFrame references — Spark's ContextCleaner
reclaims the local-checkpoint blocks once the RDDs are unreferenced and
garbage-collected) and a lock around get-or-build so exactly one
pipeline is constructed and retained per key. Builds happen under the
lock; that is cheap because every memoized pipeline uses
``localCheckpoint(eager=False)`` — construction is driver-side plan
assembly, materialization happens lazily on first action.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def materialize_shared(df, spark):
    """Materialization policy for CORPUS-PROPORTIONAL shared relations
    (the distinct-shingle table, the basket relation, the distinct
    type-user pairs — relations that grow with the corpus, unlike the
    bounded-size memos which stay on plain localCheckpoint).

    r11 VERDICT #3: localCheckpoint puts severed-lineage blocks in
    non-replicated executor storage — tolerant in local mode, but on a
    real cluster an executor loss fails the job instead of recomputing,
    and at 100 TB the relation may not fit executor storage at all. The
    strategy is therefore configurable via SNACKFS_MEMO_MATERIALIZE:

      - "local"    (default): lazy localCheckpoint — single-host / bench
                   posture, zero extra I/O, plan truncation for free.
      - "reliable": lazy reliable checkpoint into SNACKFS_CHECKPOINT_DIR
                   (HDFS/object-store path on a cluster) — survives
                   executor loss, bounded only by durable storage.
      - "none"     : no materialization — full lineage kept, every
                   consumer recomputes; the safe fallback when the
                   relation exceeds what either checkpoint store holds.

    All three modes return value-identical DataFrames; only fault
    tolerance and storage placement differ.
    """
    mode = os.environ.get("SNACKFS_MEMO_MATERIALIZE", "local")
    if mode == "local":
        return df.localCheckpoint(eager=False)
    if mode == "reliable":
        ckdir = os.environ.get("SNACKFS_CHECKPOINT_DIR")
        if ckdir:
            sc = spark.sparkContext
            if sc._jsc.sc().getCheckpointDir().isEmpty():
                sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=False)
    if mode == "none":
        return df
    raise ValueError(
        f"SNACKFS_MEMO_MATERIALIZE={mode!r}: expected local|reliable|none"
    )


class SessionMemo:
    """get_or_build cache keyed by (applicationId, sf_dir)."""

    # every instance registers here so tests that probe a property the
    # memo would short-circuit (e.g. bit-identity across partition
    # counts, which needs the pipeline REBUILT per config) can drop all
    # cached pipelines at once via clear_all_memos().
    _instances: list["SessionMemo"] = []
    # Monotone count of cache MISSES (pipeline builds) across every
    # instance since process start. bench.py snapshots it around each
    # query's first rep to bill shared-memo build cost to the first
    # toucher (r11 VERDICT #1: best-of-3 timing silently excluded every
    # one-time build from the recorded total).
    _build_events: int = 0

    def __init__(self, maxsize: int = 4) -> None:
        self._maxsize = maxsize
        self._lock = threading.Lock()
        self._entries: OrderedDict[tuple[str, str], object] = OrderedDict()
        SessionMemo._instances.append(self)

    def get_or_build(self, key: tuple[str, str], build: Callable[[], T]) -> T:
        with self._lock:
            if key in self._entries:
                self._entries.move_to_end(key)
                return self._entries[key]  # type: ignore[return-value]
            value = build()
            SessionMemo._build_events += 1
            self._entries[key] = value
            while len(self._entries) > self._maxsize:
                self._entries.popitem(last=False)
            return value

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()


def build_count() -> int:
    """Total SessionMemo pipeline builds (cache misses) so far in this
    process. A pure monotone counter: bench.py diffs it around a query's
    first rep to detect that the query was the FIRST TOUCHER of one or
    more shared memoized relations, whose one-time build cost best-of-N
    timing would otherwise discard."""
    return SessionMemo._build_events


def clear_all_memos() -> None:
    """Drop every SessionMemo's cached pipelines (test hook — see the
    determinism suite; production/bench sessions never call this)."""
    for m in SessionMemo._instances:
        m.clear()
