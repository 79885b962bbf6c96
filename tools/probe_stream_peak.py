"""Round-12 probe (VERDICT #5): where does streaming_windowed_peak's
time go? Reports per-micro-batch progress (durationMs breakdown, state
rows/commit times) and times the drain at several shard counts.

Usage: python tools/probe_stream_peak.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from snackfs_spark.session import get_spark  # noqa: E402
from snackfs_spark.sources import tables  # noqa: E402
from snackfs_spark.streaming import ingest  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def drain_with_progress(spark, shards: int) -> tuple[float, list[dict]]:
    sdf = ingest.windowed_peak_stream(spark, SF_DIR)
    name = f"probe_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ck = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    spark.conf.set("spark.sql.shuffle.partitions", str(shards))
    spark.conf.set(ck, "false")
    t0 = time.perf_counter()
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dt = time.perf_counter() - t0
    prog = [p if isinstance(p, dict) else json.loads(p) for p in q.recentProgress]
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    return dt, prog


def main() -> None:
    spark = get_spark("probe_stream_peak", cpus=32)
    tables.build_ingest_cache(spark, SF_DIR)
    # one throwaway drain to absorb codegen
    drain_with_progress(spark, 8)
    for shards in (8, 4, 2, 8):
        best, prog = min(
            (drain_with_progress(spark, shards) for _ in range(3)),
            key=lambda x: x[0],
        )
        print(f"== shards={shards}: best {best:.3f}s, {len(prog)} batches")
        for p in prog:
            dur = p.get("durationMs", {})
            states = [
                {
                    "rows": so.get("numRowsTotal"),
                    "commit": so.get("commitTimeMs"),
                    "shards": so.get("numShufflePartitions"),
                }
                for so in p.get("stateOperators", [])
            ]
            print(
                f"  batch {p['batchId']}: rows_in={p.get('numInputRows')} "
                f"durationMs={dur} state={states}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
