"""Runs every registered query against the DuckDB oracle at sf0.01 —
a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from snackfs_spark.registry import load_all
from tests.conftest import SF_ORACLE
from tests.oracle_harness import run_query_pair

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    problems = run_query_pair(spark, duck, QUERIES[name], SF_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)
