"""Streaming twin for the geo family (B163s, round 9).

B163's per-cell density audit as a continuously-maintained streaming
aggregate: the shape a location-bearing event stream (vehicle pings,
delivery scans) actually arrives in. The cell id is the SAME scan-stage
expression as the batch operator (portable md5 micro-degree coordinates →
truncating-division cell ids), so the streaming state is one counter row
per (cell_lat, cell_lon) — bounded by geometry, not stream length — and
Spark's built-in streaming hash aggregation maintains it; no arbitrary
state needed. Parity: tests/test_streaming.py drains the fixture through
the staging-dir replay harness and compares cell-for-cell against the
batch aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.geo import _DCELL, _PLANE
from ..llm.sketches import _hex_parse_spark


def streaming_cell_density(cust_stream):
    """B163s: per-cell point density over a customer/point STREAM.

    Input: a streaming DataFrame with (c_custkey, c_nationkey, c_acctbal).
    Output (complete/update mode): one row per 1° cell with n_points and
    exact floor-cents balance mass — the same release columns as the
    batch B163 minus the top-20 head (a streaming sink ranks its own
    head; state must hold every cell, which geometry bounds at 64 here).
    """
    expr = "concat('c', CAST(c_custkey AS STRING))"
    pos = cust_stream.where(F.col("c_custkey").isNotNull()).withColumns(
        {
            "slat": F.expr(f"{_hex_parse_spark(expr, 1)} % {_PLANE}"),
            "slon": F.expr(f"{_hex_parse_spark(expr, 9)} % {_PLANE}"),
        }
    )
    return (
        pos.select(
            F.expr(f"slat div {_DCELL}").alias("cell_lat"),
            F.expr(f"slon div {_DCELL}").alias("cell_lon"),
            "c_nationkey",
            F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum("cents").cast("bigint").alias("bal_cents"),
        )
    )
