"""Bench contract pins (VERDICT r13 item #4 + ADVICE r13).

The per-query rate gate excludes `_shared_build_*` rows, so WHAT those
rows may contain must be test-asserted, not just prose: the codegen
warm-up row may only run the declared pair families at the tiny warm-up
fixture — migrating real work into the excluded row (or warming at the
timed sf_dir) would silently game the rate.
"""

from __future__ import annotations

import importlib.util
import inspect
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

# The allowed warm-up plan set: exactly the six shared-state pair families
# whose builds are booked as their own `_shared_build_<name>` rows. Adding
# a name here is a DELIBERATE act reviewed with the bench change.
ALLOWED_WARMUP = frozenset(
    {
        "q_llm_dedup_jaccard",
        "q_llm_dedup_containment",
        "q_llm_substring_dup",
        "q_llm_dedup_cluster",
        "q_llm_dedup_semantic",
        "q_llm_dedup_minhash",
    }
)


def test_warmup_family_set_pinned():
    assert frozenset(bench._FAMILY_WARMUP) == ALLOWED_WARMUP, (
        "bench warm-up composition changed — review that the new plan "
        "belongs in the rate-excluded row, then update ALLOWED_WARMUP"
    )


def test_warmup_fixture_is_the_tiny_sf():
    assert bench._WARMUP_SF_DIR == "/root/testdata/sf0.001"


def test_warmup_row_runs_only_declared_plans_at_warmup_fixture():
    """Source-level pin: the single block that books the
    `_shared_build_codegen_warmup` timing iterates ONLY _FAMILY_WARMUP
    and executes ONLY at _WARMUP_SF_DIR — never the timed sf_dir."""
    src = inspect.getsource(bench.main)
    assert src.count('timings["_shared_build_codegen_warmup"]') == 1
    # the warm-up candidates derive from _FAMILY_WARMUP and nothing else
    assert "warm_names = [n for n in _FAMILY_WARMUP if n in queries]" in src
    block = src[
        src.index("warmed_ok = True") : src.index(
            '_shared_build_codegen_warmup"] = round'
        )
    ]
    assert "for name in warm_names" in block
    assert "queries[name](spark, _WARMUP_SF_DIR)" in block
    assert "sf_dir" not in block.replace("_WARMUP_SF_DIR", ""), (
        "warm-up must never touch the timed sf_dir"
    )


def test_rebench_scores_the_rerun_not_the_min():
    """VERDICT r14 what's-wrong #4: min(first, rerun) could mask a marginal
    REAL regression whose rerun lands just inside the band. The scored
    value must be the rerun (the quiet-box measurement), both measurements
    must stay recorded, and a rerun still >1.1x the snapshot must be
    called out."""
    src = inspect.getsource(bench.main)
    assert "timings[name] = rerun" in src
    assert "min(timings[name], rerun)" not in src
    assert '"first": timings[name]' in src  # both measurements recorded
    assert '"snapshot": old[name]' in src
    assert "rerun > old[name] * 1.1" in src  # suspected-regression note
    # warm-memo guard: a rerun far BELOW the band measures process-
    # lifetime memoized family state, not the query — the first
    # (pessimistic) measurement must be kept then.
    assert "rerun < old[name] * 0.75 - 0.5" in src
    i = src.index("rerun < old[name] * 0.75 - 0.5")
    j = src.index("timings[name] = rerun")
    assert i < j, "the warm-memo guard must run before the rerun is scored"


def test_warmup_row_skipped_when_fixture_missing_or_raising():
    """ADVICE r13: a missing fixture or a raising warm-up pass must SKIP
    the row (logged), not book a near-zero timing."""
    src = inspect.getsource(bench.main)
    assert "os.path.isdir(_WARMUP_SF_DIR)" in src
    assert "warmed_ok = False" in src
    # the row is booked only on the warmed_ok branch
    i = src.index("if warmed_ok:")
    j = src.index('_shared_build_codegen_warmup"] = round')
    assert i < j
