"""One-command verification drive: run every registered query against
its DuckDB oracle at one or more scale factors, the same comparison the
round driver's CORRECTNESS gate performs.

Usage: python tools/verify.py [sf|fixture_dir ...] [--window N]
       (default: 0.01 0.1 over the whole registry)

A token containing '/' is a fixture directory (e.g. var/sf1, the 10x
key-shifted replica of sf0.1 from tools/make_scale_fixture.py);
--window N limits the run to the driver's first-N correctness window —
the r6 VERDICT #6 sf1 spot-replica is
    python tools/make_scale_fixture.py var/sf1 10
    python tools/verify.py var/sf1 --window 50
Exit code 0 iff every oracled query hash-matches at every sf.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from snackfs_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    argv = sys.argv[1:]
    window = None
    skip = 0
    if "--window" in argv:
        i = argv.index("--window")
        window = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    # --skip N drops the first N registered queries: pair with --window
    # runs to split a long sweep (e.g. the window is already green at a
    # fixture, verify only the rest there) without re-running the head.
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sfs = argv or ["0.01", "0.1"]
    spark = get_spark("verify", cpus=8)
    print("entry rows:", len(e.entry(spark).collect()))
    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)[skip : skip + window if window is not None else None]
    qs = {n: qs[n] for n in names}
    failed = False
    for sf in sfs:
        sf_dir = sf if "/" in sf else f"/root/testdata/sf{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        bad = []
        for name, fn in qs.items():
            sp = fn(spark, sf_dir).toPandas()
            if name not in osql:
                continue
            od = con.execute(osql[name]).fetchdf()
            cols = sorted(sp.columns)
            ok = (
                cols == sorted(od.columns)
                and len(sp) == len(od)
                and sp[cols]
                .sort_values(cols)
                .reset_index(drop=True)
                .astype(str)
                .equals(od[cols].sort_values(cols).reset_index(drop=True).astype(str))
            )
            if not ok:
                bad.append(name)
                print(f"sf{sf} {name}: MISMATCH rows {len(sp)}/{len(od)}")
        print(f"sf{sf} MISMATCHES:", bad or "none")
        failed = failed or bool(bad)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
