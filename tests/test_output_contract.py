"""Fleet-wide output-shape contract (VERDICT r6 item 2 / r7 item 3).

The driver's differential harness sorts result columns by name and
hashes scalar values; an array/map/struct output column round-trips
through pandas as opaque Python objects whose repr differs between
Spark and DuckDB, so it can never hash-match. The r6 round lost its
two embedding queries to exactly this (array<double> z-score output);
the r7 reshape to exploded long form is the pattern every query must
follow. This test lazily ANALYZES all registered queries (no job runs
for the schema check itself) and fails on any complex-typed output
column, so the rule is enforced at registration time, not discovered
three rounds later in a driver red row.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from tests.conftest import SF_SMOKE


def test_no_complex_types_in_any_output_schema(spark):
    from dataengineeringproject_spark import registry

    bad: list[str] = []
    for name, fn in registry.queries().items():
        schema = fn(spark, SF_SMOKE).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                bad.append(
                    f"{name}.{field.name}: {field.dataType.simpleString()}"
                )
    assert not bad, (
        "complex-typed output columns break the driver's value hash "
        "(sort columns, hash scalars) — reshape to exploded long form "
        "the way embedding_standardize does:\n" + "\n".join(bad)
    )
