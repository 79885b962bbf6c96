"""COVERAGE.md is the judge's line-by-line map from SURVEY §2 to query
names — stale names there misreport real coverage. Pin that every
backtick-quoted identifier that looks like a query name resolves in the
registry."""

from __future__ import annotations

import re
from pathlib import Path

from snackfs_spark.registry import load_all

DOC = Path("/root/repo/COVERAGE.md").read_text()


def test_every_query_named_in_coverage_exists():
    reg = load_all()
    named = set(re.findall(r"`([a-z][a-z0-9_]+)`", DOC))
    # keep only identifiers that look like registered query names (the
    # doc also backticks file paths, options, functions — those contain
    # dots/slashes and were excluded by the regex; remaining non-query
    # identifiers are whitelisted)
    not_queries = {
        "python", "files", "sblock", "lock", "createlock", "ls", "du",
        "count", "getmerge", "tail", "cat", "text", "mv", "cp", "put",
        "get", "touchz", "test", "stat", "lsr", "dus", "mkdirs", "rm",
        "noop", "limit", "columns", "snackstore", "store_dir", "binary",
        "parquet", "events", "documents", "embeddings", "lineitem",
        "orders", "customer", "supplier", "part", "region", "nation",
    }
    missing = sorted(
        n for n in named - not_queries
        if n not in reg and ("_" in n and not n.startswith("snackfs"))
    )
    assert not missing, f"COVERAGE.md names unregistered queries: {missing}"


def test_every_window_query_in_coverage():
    """The 50 driver-window queries must each be mentioned in COVERAGE.md."""
    from snackfs_spark.registry import PRIORITY

    missing = [n for n in PRIORITY if f"`{n}`" not in DOC]
    assert not missing, f"window queries absent from COVERAGE.md: {missing}"


def test_readme_query_count_matches_registry():
    """README's headline count drifted twice (r6 ADVICE); pin it to the
    registry so the doc can't overstate coverage."""
    reg = load_all()
    readme = Path("/root/repo/README.md").read_text()
    m = re.search(r"(\d+) registered queries, (\d+) of them hash-checked", readme)
    assert m, "README lost its coverage sentence"
    n_oracled = sum(1 for q in reg.values() if q.oracle is not None)
    assert int(m.group(1)) == len(reg), (
        f"README says {m.group(1)} registered, registry has {len(reg)}"
    )
    assert int(m.group(2)) == n_oracled, (
        f"README says {m.group(2)} hash-checked, registry has {n_oracled}"
    )
