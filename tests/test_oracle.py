"""The t2 mirror: every registered query cross-checked against its DuckDB
oracle at sf0.01 — exactly what the driver does (SURVEY.md §5.2.1).

Rows-only queries (no oracle) get the weaker non-empty/stable-schema check.
"""

from __future__ import annotations

import pytest

from spark_kinesis_sql_asl_spark.registry import all_oracles, all_queries

from .conftest import assert_matches_oracle, sf_oracle_dir

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sf = sf_oracle_dir()
    df = QUERIES[name](spark, sf)
    assert_matches_oracle(df, ddb, ORACLES[name], sf)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    sf = sf_oracle_dir()
    df = QUERIES[name](spark, sf)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"
