"""Capture `.explain("formatted")` output for named queries.

Usage: python tools/explain_queries.py OUTDIR [SUFFIX] name1 name2 ...

Writes OUTDIR/<name>_<SUFFIX>.txt (default SUFFIX: "before") — the
optimization-round evidence files (plans/r11/<query>_before.txt /
_after.txt). Runs at sf0.01 with the ingest cache built, matching the
bench session's table layout so plan shapes are comparable.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from snackfs_spark.registry import load_all  # noqa: E402
from snackfs_spark.session import get_spark  # noqa: E402
from snackfs_spark.sources import tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir = Path(sys.argv[1])
    args = sys.argv[2:]
    suffix = "before"
    if args and args[0] in ("before", "after"):
        suffix, args = args[0], args[1:]
    outdir.mkdir(parents=True, exist_ok=True)
    reg = load_all()
    spark = get_spark("explain_queries", cpus=8)
    tables.build_ingest_cache(spark, SF_DIR)
    for name in args:
        df = reg[name].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {outdir / f'{name}_{suffix}.txt'}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
