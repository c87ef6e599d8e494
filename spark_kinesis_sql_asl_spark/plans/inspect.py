"""Physical-plan inspection helpers (SURVEY.md §4).

The engine ships zero custom Catalyst rules — its scale posture rests on
Catalyst choosing the right built-in plan (pushdown, pruning, broadcast,
partial aggregation). These helpers make that checkable: tests assert plan
properties the same way a human reads ``df.explain("formatted")``, so a
refactor that silently de-optimizes a query (drops a pushed filter, flips a
broadcast join to sort-merge, adds a shuffle) fails CI instead of shipping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every parquet scan (column pruning)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node name (e.g. 'Exchange',
    'BroadcastHashJoin', 'SortMergeJoin') in the formatted plan's tree."""
    plan = formatted_plan(df)
    tree = plan.split("\n\n", 1)[0]  # numbered tree, not the node details
    return len(re.findall(rf"\b{re.escape(node)}\b", tree))
