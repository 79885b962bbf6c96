"""Shuffled vs bucketed basket-mining measurement (r8 VERDICT #5).

mining_association_rules was the steepest operator in the r8 100x sweep
(0.67/decade — sublinear but dominated by the basket-key self-join
shuffle). This measures the layout lever: the SAME rules pipeline over
(a) the parquet scan + shuffle path (the registered query) and (b) the
basket relation pre-bucketed by l_orderkey (sources/bucketed.py), where
the self-join consumes co-located sorted buckets with zero exchange.

Ingest (distinct + bucketed write) is billed separately — it is the
one-time layout decision a 100 TB deployment amortizes across every
mining/recommendation query on the basket key.

Usage: python tools/bucketed_basket_bench.py [sf_dir] [buckets]
       (default /root/repo/var/sf10, 32 buckets)
Writes var/bucketed_basket_bench.json.
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(_REPO / "var/sf10")
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    # size the driver heap like scale_stress (r8 VERDICT #6)
    from scale_stress import driver_mem_for  # noqa: E402

    name = os.path.basename(sf_dir.rstrip("/"))
    sf = float(name.removeprefix("sf")) if name.startswith("sf") else 1.0
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", driver_mem_for(sf))

    from snackfs_spark.registry import load_all  # noqa: E402
    from snackfs_spark.session import get_spark  # noqa: E402
    from snackfs_spark.sources import bucketed, tables  # noqa: E402

    registry = load_all()
    spark = get_spark("bucketed_basket_bench")
    tables.build_ingest_cache(spark, sf_dir)

    t0 = time.perf_counter()
    bucketed.build_bucketed_baskets(spark, sf_dir, buckets=buckets)
    ingest_sec = time.perf_counter() - t0

    def best_of(fn, runs: int = 2) -> float:
        best = float("inf")
        for _ in range(runs):
            start = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - start)
        return best

    shuffled = best_of(
        lambda: registry["mining_association_rules"].fn(spark, sf_dir)
    )
    bucketed_sec = best_of(lambda: bucketed.association_rules_bucketed(spark))

    # sanity: identical results
    a = registry["mining_association_rules"].fn(spark, sf_dir)
    b = bucketed.association_rules_bucketed(spark)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()

    out = {
        "sf_dir": sf_dir,
        "buckets": buckets,
        "ingest_sec": round(ingest_sec, 3),
        "shuffled_sec": round(shuffled, 3),
        "bucketed_sec": round(bucketed_sec, 3),
        "speedup": round(shuffled / bucketed_sec, 2),
        "rows_diff": diff,
    }
    print(json.dumps(out, indent=1))
    (_REPO / "var/bucketed_basket_bench.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, str(_REPO / "tools"))
    main()
