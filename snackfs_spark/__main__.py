"""Shell veneer: the reference's CLI surface (SnackFSShell.scala:40-62 —
`ls lsr du dus count cat tail stat test getmerge ...`) over SnackCatalog.

    python -m snackfs_spark [--sf-dir DIR] ls /data/src0
    python -m snackfs_spark cat /data/src0/doc_7.txt
    python -m snackfs_spark test -e /data/src0   # exit code, like the shell

Formatting is client-side (as in the reference — column-width scanning in
SnackFSShell.scala:296-311 is presentation, not query); every verb
delegates to the same DataFrame plans the oracle checks.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _show(df, n: int = 1000) -> None:
    df.show(n, truncate=False)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="snackfs_spark")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--cpus", type=int, default=8)
    sub = p.add_subparsers(dest="verb", required=True)
    for verb in ("ls", "lsr", "du", "dus", "count", "stat", "cat", "rm"):
        s = sub.add_parser(verb)
        s.add_argument("path")
    t = sub.add_parser("tail")
    t.add_argument("path")
    t.add_argument("-n", type=int, default=1024)
    te = sub.add_parser("test")
    te.add_argument("-e", dest="t_exists", action="store_true")
    te.add_argument("-z", dest="t_zero", action="store_true")
    te.add_argument("-d", dest="t_dir", action="store_true")
    te.add_argument("path")
    mv = sub.add_parser("mv")
    mv.add_argument("src")
    mv.add_argument("dst")
    sub.add_parser("getmerge")
    sub.add_parser("locations")
    sub.add_parser("locks")
    sub.add_parser("mkdir")
    an = sub.add_parser(
        "analyze",
        help="run any registered analytics query (see 'analyze --list')",
    )
    an.add_argument("query", nargs="?", default=None)
    an.add_argument("--list", dest="an_list", action="store_true")
    an.add_argument("-n", type=int, default=50, help="rows to show")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from snackfs_spark.catalog import SnackCatalog
    from snackfs_spark.session import get_spark

    # getOrCreate may hand us a session someone else owns (tests, a
    # notebook): only stop what we actually created.
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("snackfs_shell", cpus=args.cpus)
    cat = SnackCatalog(spark, args.sf_dir)
    rc = 0
    if args.verb == "ls":
        _show(cat.ls(args.path))
    elif args.verb == "lsr":
        _show(cat.lsr(args.path))
    elif args.verb == "du":
        _show(cat.du(args.path))
    elif args.verb == "dus":
        _show(cat.dus(args.path))
    elif args.verb == "count":
        _show(cat.count(args.path))
    elif args.verb == "stat":
        rows = cat.stat(args.path).collect()
        if not rows:
            print(f"stat: {args.path}: no such file or directory", file=sys.stderr)
            rc = 1
        else:
            _show(cat.stat(args.path))
    elif args.verb == "cat":
        rows = cat.read().filter(F.col("path") == args.path).collect()
        if not rows:
            print(f"cat: {args.path}: no such file", file=sys.stderr)
            rc = 1
        else:
            print(rows[0]["text"])
    elif args.verb == "tail":
        rows = cat.tail(args.n).filter(F.col("path") == args.path).collect()
        if not rows:
            print(f"tail: {args.path}: no such file", file=sys.stderr)
            rc = 1
        else:
            print(rows[0]["tail_text"])
    elif args.verb == "test":
        row = cat.test_predicates(args.path).collect()[0]
        key = (
            "is_zero" if args.t_zero
            else "is_directory" if args.t_dir
            else "exists_flag"
        )
        rc = 0 if row[key] else 1
    elif args.verb == "mv":
        _show(cat.rename_plan(args.src, args.dst))
    elif args.verb == "rm":
        _show(cat.delete_survivors(args.path))
    elif args.verb == "getmerge":
        _show(cat.getmerge().select("dir", F.length("merged").alias("bytes")))
    elif args.verb == "locations":
        _show(cat.block_locations())
    elif args.verb == "locks":
        _show(cat.lock_holders())
    elif args.verb == "mkdir":
        _show(cat.mkdirs_closure())
    elif args.verb == "analyze":
        from snackfs_spark.registry import load_all

        reg = load_all()
        if args.an_list or args.query is None:
            for name in reg:
                print(name)
        elif args.query not in reg:
            print(f"analyze: unknown query {args.query!r}", file=sys.stderr)
            rc = 1
        else:
            _show(reg[args.query].fn(spark, args.sf_dir), args.n)
    if owns_session:
        spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
