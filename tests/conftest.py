from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from snackfs_spark.session import get_spark

    s = get_spark("snackfs_spark_tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_harness import duckdb_connection

    con = duckdb_connection(SF_ORACLE)
    yield con
    con.close()
