"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export over :mod:`spark_kinesis_sql_asl_spark` — the registry pairs
every implemented SURVEY.md §2 operator with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from spark_kinesis_sql_asl_spark.registry import all_oracles, all_queries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "q_join_multiway"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 M1): 5-table star join, filtered revenue
    by region/nation, on /root/testdata/sf0.001."""
    return all_queries()[_FLAGSHIP](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
