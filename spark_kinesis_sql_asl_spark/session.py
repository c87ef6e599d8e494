"""SparkSession factory for local development, tests and bench.

The driver supplies its own session to ``entry()``/``queries()``; runtime-
settable confs that correctness depends on (session timezone) are therefore
re-applied per query via :func:`spark_kinesis_sql_asl_spark.tables.prep`, not
only here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "spark-kinesis-sql-asl-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Determinism + DuckDB-oracle agreement (SURVEY.md §4):
        .config("spark.sql.session.timeZone", "UTC")
        # Scale posture: AQE coalesces/skew-splits at runtime; at 100 TB the
        # same plan re-partitions itself instead of needing hand-tuning.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
