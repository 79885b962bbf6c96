"""Spot-check named queries against their DuckDB oracles at one sf —
the same comparison tools/verify.py runs over the whole registry, for
fast iteration on a single operator.

Usage: python tools/check_one.py <query> [<query> ...] [--sf 0.01]
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
    args = sys.argv[1:]
    sf = "0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    # a token containing '/' is a fixture directory (verify.py's
    # convention: e.g. --sf var/sf1 targets the 10x replica)
    sf_dir = sf if "/" in sf else f"/root/testdata/sf{sf}"
    spark = get_spark("check-one", cpus=8)
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = False
    for name in args:
        sp = qs[name](spark, sf_dir).toPandas()
        if name not in osql:
            print(f"{name}: no oracle; rows={len(sp)}")
            continue
        od = con.execute(osql[name]).fetchdf()
        cols = sorted(sp.columns)
        if cols != sorted(od.columns):
            print(f"{name}: COLUMN MISMATCH {cols} vs {sorted(od.columns)}")
            failed = True
            continue
        a = sp[cols].sort_values(cols).reset_index(drop=True).astype(str)
        b = od[cols].sort_values(cols).reset_index(drop=True).astype(str)
        if len(a) != len(b):
            print(f"{name}: ROW COUNT {len(a)} vs {len(b)}")
            failed = True
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"{name}: VALUE MISMATCH on {int(diff.sum())} rows")
            print("spark:\n", a[diff].head(5))
            print("oracle:\n", b[diff].head(5))
            failed = True
        else:
            print(f"{name}: OK rows={len(a)}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
