"""Opt-in sf1-class decade slope gate (VERDICT r12 item #6).

Round 12 measured the three heaviest pair families a full decade above the
default scaling tests (50k -> 500k docs / 7.2k -> 72k docs for the semantic
family) and recorded slopes 0.30 / 0.24 / 0.87 in DESIGN-100TB.md §19 — but
as a one-off script whose numbers would silently age. This test wraps the
same measurement (scripts/run_decade_sf1.py:run_decade) as a pytest gate so
a future plan regression — e.g. a lost pushdown re-quadraticizing the
PPJoin candidate stage — fails a TEST.

Excluded from default runs (pytest.ini addopts deselects the marker;
runtime ~6-10 min dominated by the 500k-doc fixture generation, which is
idempotent across runs in one container). Opt in with:

    python -m pytest tests/test_sf1_decade.py -m sf1decade -q

Gate values are ~1.5-4x above the round-12/13 measurements (BASELINE.md
documents both), wide enough for box variance, tight enough that a
quadratic regression (slope -> ~2) fails every family.
"""

from __future__ import annotations

import pytest

# slope ceilings per family: measured r12 0.30/0.24/0.87, r13 0.285/0.377/
# 0.937, r14 0.489/0.333/0.825 (DECADE_r14.json). The semantic gate
# tightened 1.2 -> 1.1 per VERDICT r13 item #5 once the shared
# portable-signature barrier pulled its re-measured slope under 0.9; the
# token families keep generous 1.5 ceilings because their slopes swing
# ~±0.2 with JIT/warm-up state while staying far sub-linear.
_GATES = {
    "q_llm_dedup_jaccard": 1.5,
    "q_llm_substring_dup": 1.5,
    "q_llm_dedup_semantic": 1.1,
}


@pytest.mark.sf1decade
def test_sf1_decade_slopes(spark):
    from scripts.run_decade_sf1 import run_decade

    out = run_decade(spark)
    assert set(out["families"]) == set(_GATES)
    failures = []
    for name, gate in _GATES.items():
        fam = out["families"][name]
        if fam["slope"] >= gate:
            failures.append(
                f"{name}: slope {fam['slope']} >= {gate} over {fam['scale']}"
                f" ({fam['t_small']}s -> {fam['t_big']}s)"
            )
    assert not failures, "; ".join(failures)
