"""Time named queries with the bench's exact methodology (ingest-cache
warmup, noop sink, best of N) without running the whole battery — the
optimization round's inner measurement loop.

Usage: python tools/time_queries.py [--sf-dir DIR] [--cpus N] [--reps N] name...
Prints one `name: best_s  (r1 r2 r3)` line per query, then a JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from snackfs_spark.registry import load_all  # noqa: E402
from snackfs_spark.session import get_spark  # noqa: E402
from snackfs_spark.sources import fsmodel, tables  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = None
    reps = 3
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--cpus":
            cpus = int(next(it))
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)
    registry = load_all()
    spark = get_spark("time_queries", cpus=cpus)
    tables.build_ingest_cache(spark, sf_dir)
    registry["q6_revenue_forecast"].fn(spark, sf_dir).collect()
    fsmodel.files_df(spark, sf_dir).count()
    fsmodel.content_df(spark, sf_dir).count()
    fsmodel.locks_df(spark, sf_dir).count()

    out: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            start = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - start)
        out[name] = round(min(samples), 3)
        print(
            f"{name}: {out[name]}s  ({' '.join(f'{s:.3f}' for s in samples)})",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
