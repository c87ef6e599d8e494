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


def unbounded_partitionless_windows(df: DataFrame) -> list[str]:
    """Partitionless Window nodes NOT fed by a row limit — the scale smell.

    A window with an empty partitionSpec moves every input row to one task.
    That is fine (and warning-noise only) when the input is a
    ``TakeOrderedAndProject``/``limit(K)`` head of bounded K; at any other
    spot it is a 100 TB single-task sort. Walks the optimized logical plan
    and returns a description of each partitionless Window whose subtree
    contains no GlobalLimit, so tests can assert the list is empty — which
    also means the benign ``WindowExec: No Partition Defined`` bench
    warnings can never mask a real one (round-5 verdict item).
    """

    def walk(node):
        yield node
        kids = node.children()
        for i in range(kids.length()):
            yield from walk(kids.apply(i))

    def subtree_has_limit(node) -> bool:
        return any(
            n.getClass().getSimpleName() in ("GlobalLimit", "LocalLimit")
            for n in walk(node)
        )

    root = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001
    bad = []
    for node in walk(root):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
            and not subtree_has_limit(node)
        ):
            bad.append(node.simpleString(120))
    return bad


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node name (e.g. 'Exchange',
    'BroadcastHashJoin', 'SortMergeJoin') in the formatted plan's tree."""
    plan = formatted_plan(df)
    tree = plan.split("\n\n", 1)[0]  # numbered tree, not the node details
    return len(re.findall(rf"\b{re.escape(node)}\b", tree))
