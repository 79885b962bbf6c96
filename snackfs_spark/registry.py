"""Query registry: the single source of truth wiring SURVEY.md §2 operators
to (a) a PySpark callable and (b) the equivalent DuckDB oracle SQL.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.

Register with the decorator:

    @register("q1_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q1(spark, sf_dir): ...

Oracle-less (non-SQL-expressible) operators pass ``oracle=None`` and get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (each registers its queries) and return
    the populated registry."""
    # Imports are side-effecting by design; keep the list explicit so a
    # missing module is an error, not silent coverage loss.
    from snackfs_spark.operators import (  # noqa: F401
        content,
        dedup,
        fsops,
        functions_battery,
        interval_join,
        multimodal,
        relational,
        sampling,
        similarity,
        textstats,
        windows,
    )
    from snackfs_spark.streaming import ingest  # noqa: F401

    return REGISTRY
