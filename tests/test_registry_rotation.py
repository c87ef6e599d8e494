"""Round-8 rotation window assertions (VERDICT r7 item #1).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-7 proved the rotation must be
*recomputed* (not guessed) each round from the committed CORRECTNESS
artifacts. Round 7 closed the ledger fully green (0 red cumulative, the
never-sampled set empty), so round 8 is pure freshness retirement:

  slots 0..41     the 42 alphabetically-first of the 50 queries last
                  driver-sampled in ROUND 1 (override 5) — exactly the
                  scans/filters/joins/aggs/sets the r6/r7 memoization
                  refactors ran over, re-confirmed on the hard signal
  slots 42..~49   new round-8 queries (decorator priority=30)

The 13 canaries are pinned at 100 FOR THIS ROUND ONLY (all carry fresh
r7 green rows); they return to priority 10 in round 9 alongside the 8
deferred r1-era queries (windows + topk/unpivot).

If you add new queries this round: decorator ``priority=30`` keeps them
inside the window; add their names to ROUND8_NEW_THIS_ROUND below; the
budget test fails the moment the low-priority population exceeds the
50-slot window.
"""

from __future__ import annotations

import json
import os

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries first registered in round 8 (decorator priority=30): they have no
# CORRECTNESS row yet by construction. Keep in sync as operators land.
ROUND8_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        # in-window (priority 30) — first driver look this round
        "q_llm_dedup_semantic",
        "q_llm_semantic_cell_audit",
        "q_llm_ingest_neardup",
        "q_llm_cross_dup_matrix",
        "q_agg_theil",
        "q_events_ks_test",
        "q_win_streaks",
        "q_ts_seasonality",
        # rotation tail (priority 35, the B142/C124 precedent): the window
        # is full at 42 rotated + 8 new, so these take their first driver
        # row in round 9
        "q_events_mannwhitney",
        "q_join_bucketed",
        "q_llm_semantic_survivors",
        "q_llm_semantic_yield",
        "q_events_survival",
        "q_win_skyline",
        "q_llm_semantic_clusters",
        "q_llm_embed_pca_power",
        "q_ts_acf",
        "q_llm_dup_inflation",
        "q_canary_ln_quant",
        "q_llm_semantic_dedup_e2e",
        "q_ts_pacf",
        "q_events_kruskal",
        "q_events_anova",
        "q_events_spearman",
        "q_ts_ccf",
        "q_llm_dup_pagerank",
        "q_llm_kmv_distinct",
        "q_llm_cms_heavy",
        "q_privacy_dp_hist",
        "q_llm_weighted_sample",
        "q_zorder_layout",
        "q_ts_trend_forecast",
        "q_llm_kmv_setops",
        "q_llm_minhash_portable",
        "q_llm_dup_kcore",
        "q_llm_band_tuning",
        "q_events_entropy_rate",
        "q_ts_peaks",
        "q_llm_band_assign",
        "q_agg_cov_matrix",
        "q_canary_wideint_convert",
        "q_llm_ndcg",
        "q_llm_mrr",
        "q_llm_quality_ece",
        "q_llm_rater_kappa",
        "q_geo_cell_density",
        "q_geo_dist_join",
        "q_geo_knn",
        "q_geo_hotspot",
    }
)

# Slots reserved for the freshness rotation: 50 - len(ROUND8_NEW_THIS_ROUND).
ROTATED_IN_COUNT = 42

DRIVER_WINDOW = 50


def _ordered():
    registry.load_all()
    return registry._ordered_names()


def _priority(name: str) -> int:
    return registry._PRIORITY[name][0]


def _rows_through(last_round: int) -> dict[str, dict]:
    latest: dict[str, dict] = {}
    for r in range(1, last_round + 1):
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):  # pragma: no cover - driver artifact
            pytest.skip(f"missing {path}")
        with open(path) as f:
            latest.update(json.load(f))
    return latest


def _last_sampled() -> dict[str, int]:
    last: dict[str, int] = {}
    for r in range(1, 8):
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):  # pragma: no cover - driver artifact
            pytest.skip(f"missing {path}")
        with open(path) as f:
            for q in json.load(f):
                last[q] = r
    return last


def _rotated_in() -> list[str]:
    """The freshness-rotation set, recomputed from the artifacts: the
    alphabetically-first ROTATED_IN_COUNT of the round-1-last-sampled."""
    last = _last_sampled()
    r1 = sorted(q for q, r in last.items() if r == 1)
    return r1[:ROTATED_IN_COUNT]


def test_never_sampled_set_is_empty_after_r7():
    """Round 7 kept the sampling debt closed: every query registered
    through round 7 has a CORRECTNESS row. Recomputed, not copied."""
    registry.load_all()
    never = (
        set(registry._QUERIES)
        - set(_rows_through(7))
        - ROUND8_NEW_THIS_ROUND
    )
    assert never == set(), f"never-sampled after r7: {sorted(never)}"


def test_no_reds_to_recheck():
    """Round 7's ledger is fully green — the re-check set is EMPTY, so no
    query carries override 0 this round (rows-only ``no_oracle`` rows are
    sampled-clean, not red)."""
    latest = _rows_through(7)
    reds = {
        n
        for n, row in latest.items()
        if row.get("err") not in (None, "no_oracle")
        or (
            row.get("hash_match") is not None
            and not (
                row["rows_match"] and row["schema_match"] and row["hash_match"]
            )
        )
    }
    assert reds == set(), f"unexpected reds: {sorted(reds)}"
    registry.load_all()
    at_zero = [n for n in registry._QUERIES if _priority(n) == 0]
    assert at_zero == [], f"override 0 without a red: {at_zero}"


def test_rotated_set_heads_the_window():
    """Window head = the recomputed freshness-rotation set, in override-5
    order. The driver re-confirms the r6/r7-refactored relational paths."""
    rotated = _rotated_in()
    names = _ordered()
    head = names[: len(rotated)]
    assert set(head) == set(rotated), (
        f"window head != rotated set; missing="
        f"{sorted(set(rotated) - set(head))} "
        f"extra={sorted(set(head) - set(rotated))}"
    )
    assert all(_priority(n) == 5 for n in head)


def test_canaries_pinned_out_this_round():
    """r8 exception: the 13 legacy canaries (all r7-green) sit at 100 to
    free window slots for the freshness rotation; the NEW canaries (D14
    ln-quant, D15 wideint-convert) ride the p35 rotation tail for their
    first driver rows. All 15 revert to 10 in round 9."""
    registry.load_all()
    canaries = [n for n in registry._QUERIES if n.startswith("q_canary_")]
    assert len(canaries) == 15
    for n in canaries:
        want = (
            35
            if n in ("q_canary_ln_quant", "q_canary_wideint_convert")
            else 100
        )
        assert _priority(n) == want, (n, _priority(n))


def test_window_budget_not_overflowed_by_new_queries():
    """Every entry with priority <=30 must fit in the 50-slot window.

    42 rotated slots are reserved; at most 8 new p30 queries fit.
    Registering a 9th would push something out silently — this test makes
    it loud instead.
    """
    registry.load_all()
    low = [n for n in registry._QUERIES if _priority(n) <= 30]
    assert len(low) <= DRIVER_WINDOW, (
        f"{len(low)} queries at priority<=30 but the driver samples only "
        f"~{DRIVER_WINDOW}; rotate some to 100 or raise their priority"
    )
    names = _ordered()
    assert set(low) <= set(names[:DRIVER_WINDOW])


def test_new_this_round_constant_is_exact():
    """ROUND8_NEW_THIS_ROUND == (registered queries without any driver
    row) — the r6 lesson (ADVICE r6 #1): the constant must be updated with
    EVERY new @query, or the recomputation tests above drift."""
    registry.load_all()
    unsampled = set(registry._QUERIES) - set(_rows_through(7))
    assert unsampled == ROUND8_NEW_THIS_ROUND


def test_new_queries_land_inside_the_window():
    registry.load_all()
    for n in sorted(ROUND8_NEW_THIS_ROUND):
        assert n in registry._QUERIES, f"{n} listed but not registered"
        assert _priority(n) in (30, 35), f"{n}: expected p30/p35"
    names = _ordered()
    window = set(names[:DRIVER_WINDOW])
    in_window = {n for n in ROUND8_NEW_THIS_ROUND if _priority(n) == 30}
    missing = in_window - window
    assert not missing, f"p30 queries outside the window: {sorted(missing)}"
    # the p35 tail sits directly AFTER the window, ahead of every pinned
    # 100 — first in line for the round-9 rotation
    tail = {n for n in ROUND8_NEW_THIS_ROUND if _priority(n) == 35}
    after = set(names[DRIVER_WINDOW : DRIVER_WINDOW + len(tail)])
    assert tail == after, (sorted(tail), sorted(after))


def test_every_ever_green_query_pinned_at_5_or_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of the rotation plan: ever-sampled
    queries sit either in the recomputed rotation set (5) or at 100."""
    registry.load_all()
    rotated = set(_rotated_in())
    for n in sorted(set(_rows_through(7)) & set(registry._QUERIES)):
        p = _priority(n)
        if n in rotated:
            assert p == 5, f"{n}: rotated-in must be 5, got {p}"
        else:
            assert p == 100, f"{n}: ever-sampled but priority {p}"
