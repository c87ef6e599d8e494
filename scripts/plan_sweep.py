#!/usr/bin/env python
"""Round-14 optimization tooling: sweep every registered query, capture
``explain("formatted")`` and count plan smells (Exchanges, sort-merge
joins, Python-boundary nodes, cartesian products), joined with the latest
BENCH_DETAIL times so optimization effort ranks by (cost x smell).

Usage: python scripts/plan_sweep.py OUTDIR [query ...]
Writes OUTDIR/<query>.txt (formatted plan) and OUTDIR/summary.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from spark_kinesis_sql_asl_spark.plans.inspect import formatted_plan  # noqa: E402
from spark_kinesis_sql_asl_spark.registry import all_queries  # noqa: E402
from spark_kinesis_sql_asl_spark.session import get_session  # noqa: E402

_NODES = (
    "Exchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "Window",
    "Sort",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep"
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("plan-sweep")
    queries = all_queries()
    names = sys.argv[2:] or sorted(queries)

    bench = {}
    bd = os.path.join(_REPO, "BENCH_DETAIL.json")
    if os.path.exists(bd):
        with open(bd) as f:
            bench = json.load(f)["queries"]

    summary = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            summary[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        build_s = round(time.perf_counter() - t0, 3)
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        tree = plan.split("\n\n", 1)[0]
        counts = {
            n: len(re.findall(rf"\b{re.escape(n)}\b", tree)) for n in _NODES
        }
        counts = {k: v for k, v in counts.items() if v}
        summary[name] = {
            "bench_s": bench.get(name),
            "build_s": build_s,
            **counts,
        }
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    # quick console ranking: bench seconds desc
    ranked = sorted(
        (v.get("bench_s") or 0, k) for k, v in summary.items()
    )[::-1]
    for s, k in ranked[:40]:
        v = summary[k]
        smells = {
            n: v[n]
            for n in (
                "Exchange",
                "SortMergeJoin",
                "CartesianProduct",
                "BatchEvalPython",
                "ArrowEvalPython",
                "BroadcastNestedLoopJoin",
            )
            if v.get(n)
        }
        print(f"{s:7.2f}  build={v.get('build_s', 0):6.2f}  {k}  {smells}")
    spark.stop()


if __name__ == "__main__":
    main()
