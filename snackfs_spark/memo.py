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

import threading
from collections import OrderedDict
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


class SessionMemo:
    """get_or_build cache keyed by (applicationId, sf_dir)."""

    # every instance registers here so tests that probe a property the
    # memo would short-circuit (e.g. bit-identity across partition
    # counts, which needs the pipeline REBUILT per config) can drop all
    # cached pipelines at once via clear_all_memos().
    _instances: list["SessionMemo"] = []

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


def clear_all_memos() -> None:
    """Drop every SessionMemo's cached pipelines (test hook — see the
    determinism suite; production/bench sessions never call this)."""
    for m in SessionMemo._instances:
        m.clear()
