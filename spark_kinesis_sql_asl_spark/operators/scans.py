"""Scans (SURVEY.md §2 rows B1-B3).

The reference delegates all scanning to Spark once records are ingested;
these queries pin the batch scan surface: full scan, column-pruned scan
(pruning reaches the Parquet reader), predicate-pushdown scan (row-group
filtering). Verified via .explain: ReadSchema shows only selected columns,
PushedFilters shows the shipdate predicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "q_scan_full",
    oracle="SELECT * FROM lineitem",
)
def q_scan_full(spark, sf_dir):
    return table(spark, sf_dir, "lineitem")


@query(
    "q_scan_pruned",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def q_scan_pruned(spark, sf_dir):
    # Column pruning: ReadSchema must contain exactly these two columns.
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "q_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def q_scan_pushdown(spark, sf_dir):
    # Predicate reaches the Parquet reader as PushedFilters → row-group skip;
    # at 100 TB with a date-partitioned layout this becomes partition pruning.
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    )
