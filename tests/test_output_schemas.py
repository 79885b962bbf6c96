"""Every registered query must emit ONLY scalar output columns: the
driver's rows-only canonicalizer dies on list cells (the round-1
approx_aggregates failure) and ARRAY/BINARY/TIMESTAMP values hash
differently between engines. This pins the never-emit-non-scalars rule
for the whole registry, not just the queries that once broke it."""

from __future__ import annotations

import pytest

from snackfs_spark.registry import load_all
from tests.conftest import SF_SMALL

SCALAR_TYPES = {"string", "long", "integer", "double", "float", "boolean", "date", "short"}

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_is_scalar_only(name, spark):
    df = QUERIES[name].fn(spark, SF_SMALL)
    for f in df.schema.fields:
        assert f.dataType.typeName() in SCALAR_TYPES, (
            f"{name}.{f.name} emits {f.dataType.typeName()} — "
            "project to scalars (driver canonicalizer / cross-engine hash)"
        )
