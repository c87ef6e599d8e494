#!/usr/bin/env python
"""One-off sf1-class scaling decade (VERDICT r11 item #4).

tests/test_scaling.py's constant-density decade tops out at 50k docs (the
sf0.1-class corpus). This script measures one genuinely BIGGER decade —
50k → 500k docs (sf1-class), same constant-dup-density recipe from
scripts/gen_scaling_fixture.py — for the THREE heaviest pair families only:

  C2   q_llm_dedup_jaccard    (PPJoin prefix-filtered exact Jaccard)
  C110 q_llm_substring_dup    (every-position shingle diagonal runs)
  C125 q_llm_dedup_semantic   (cell-blocked SemDeDup pair join)

Each family is timed on its FIRST touch per (session, sf_dir) — the honest
build+consume cost, the same convention as the pytest decade — and the
log-log slope over the true 10× lands in DESIGN-100TB.md §19. NOT part of
the default test/bench suites (runtime ~10-20 min); rerun with:

    python scripts/run_decade_sf1.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from scripts.gen_scaling_fixture import generate  # noqa: E402
from spark_kinesis_sql_asl_spark.registry import all_queries  # noqa: E402
from spark_kinesis_sql_asl_spark.session import get_session  # noqa: E402

_ROOT = "/tmp/spark_scaling_fixture"
# Token families run the 50k -> 500k docs decade; the SEMANTIC family runs
# its own largest clean 10x (7.2k -> 72k docs = 2,880 -> 28,800 vectors:
# the spread direction family caps at 1,152 directions — beyond that the
# fixture's pair output stops being O(N) and the slope would measure the
# data, not the plan).
_FAMILIES = {
    "q_llm_dedup_jaccard": (
        (os.path.join(_ROOT, "d50k"), 50_000),
        (os.path.join(_ROOT, "d500k"), 500_000),
    ),
    "q_llm_substring_dup": (
        (os.path.join(_ROOT, "d50k"), 50_000),
        (os.path.join(_ROOT, "d500k"), 500_000),
    ),
    "q_llm_dedup_semantic": (
        (os.path.join(_ROOT, "d7200"), 7_200),
        (os.path.join(_ROOT, "d72000"), 72_000),
    ),
}


def _decade_conf(spark, name: str, n_docs: int) -> None:
    """Per-scale config, mirroring tests/test_scaling.py: the semantic
    family's cell count grows with the corpus (k ~ N/cell_target keeps
    cell SIZE bounded — fixed k would make the cell join Θ(N²/k) by
    construction)."""
    if name == "q_llm_dedup_semantic":
        n_vecs = 2 * n_docs // 5
        spark.conf.set(
            "spark.kinesislike.semantic.cells", str(max(16, n_vecs // 125))
        )


def run_decade(spark) -> dict:
    """Generate (idempotent) the sf1-class fixtures and measure the three
    heaviest families' first-touch decade slopes. Shared by the CLI below
    and the opt-in ``-m sf1decade`` pytest gate (tests/test_sf1_decade.py,
    VERDICT r12 item #6) so a plan regression fails a TEST instead of
    silently aging DESIGN-100TB §19."""
    t0 = time.perf_counter()
    for scales in _FAMILIES.values():
        for d, n in scales:
            generate(d, n)
    gen_s = round(time.perf_counter() - t0, 1)

    queries = all_queries()

    def run(name: str, sf_dir: str) -> float:
        t = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t, 2)

    # codegen warm-up on the driver fixture (different memo key: warms the
    # JVM, not the family state)
    for name in _FAMILIES:
        run(name, "/root/testdata/sf0.001")

    out = {"gen_seconds": gen_s, "families": {}}
    for name, ((d_small, n_small), (d_big, n_big)) in _FAMILIES.items():
        times = {}
        for sf_dir, n_docs in ((d_small, n_small), (d_big, n_big)):
            _decade_conf(spark, name, n_docs)
            times[n_docs] = run(name, sf_dir)  # first touch: build+consume
        if name == "q_llm_dedup_semantic":
            spark.conf.unset("spark.kinesislike.semantic.cells")
        slope = math.log(times[n_big] / times[n_small]) / math.log(10.0)
        out["families"][name] = {
            "scale": f"{n_small}->{n_big} docs",
            "t_small": times[n_small],
            "t_big": times[n_big],
            "slope": round(slope, 3),
        }
        print(f"{name}: {times}  slope={slope:.3f}", flush=True)
    return out


def main() -> None:
    spark = get_session("decade_sf1")
    out = run_decade(spark)
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade_sf1.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
