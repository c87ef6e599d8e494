"""Registry-wide output-schema discipline (the round-2 ERR class, closed
permanently): the driver's pandas canonicalizer factorizes cells, so a
complex-typed output column (array/map/struct) crashes it — q_llm_fingerprint
did exactly that in round 2. Every query must emit flat, hashable columns;
list-shaped results render as sorted comma-joined strings (B32/C27
convention). This test walks every registered query's analyzed schema at
sf0.001 so a regression is caught at registration time, not driver time.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from spark_kinesis_sql_asl_spark.registry import all_queries

SF_SMOKE = "/root/testdata/sf0.001"

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_columns_are_flat(spark, name):
    schema = QUERIES[name](spark, SF_SMOKE).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name} emits complex-typed columns {complex_cols} — the driver "
        "canonicalizer cannot factorize these; render as comma-joined "
        "strings (B32/C27 convention)"
    )
