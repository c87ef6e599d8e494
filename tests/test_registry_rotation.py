"""Round-7 rotation window assertions (VERDICT r6 item #1/#5).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-6 proved the rotation must be
*recomputed* (not guessed) each round from the committed CORRECTNESS
artifacts. Round 7 is the first round where the never-sampled set is EMPTY
(all 256 registered queries received a driver row by r6), so the window is:

  slot 0          q_cusum_changepoint (override 0 — the one r6 driver RED;
                  its DuckDB oracle was rewritten this round, the Spark
                  side is judge-proven correct, and it must re-enter the
                  window for its green row)
  slots 1..13     the canaries (decorator priority 10; 13 after D13
                  landed this round)
  slots 13..~49   new round-7 queries (decorator priority=30)

If you add new queries this round: decorator ``priority=30`` keeps them
inside the window; add their names to ROUND7_NEW_THIS_ROUND below; the
budget test fails the moment the low-priority population exceeds the
50-slot window.
"""

from __future__ import annotations

import json
import os

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (a) the r6 driver REDs: rows+schema matched, hash didn't — judge
# root-caused to a DuckDB 1.0.0 list_reduce outer-reference bug in the
# ORACLE (engine side correct); oracle rewritten via the prefix-sum /
# running-min CUSUM identity this round. Re-checked first.
ROUND7_RECHECK = frozenset({"q_cusum_changepoint"})

# Queries first registered in round 7 (decorator priority=30): they have no
# CORRECTNESS row yet by construction. Keep in sync as operators land.
ROUND7_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_llm_substring_dup",
        "q_llm_span_coverage",
        "q_llm_paragraph_dedup",
        "q_llm_template_mine",
        "q_llm_ngram_novelty_decay",
        "q_llm_rejection_sample",
        "q_llm_dedup_yield_curve",
        "q_llm_quality_isotonic",
        "q_ts_ewma_cross",
        "q_agg_hhi",
        "q_win_mom_growth",
        "q_llm_dup_centrality",
        "q_ts_backlog",
        "q_llm_bloom_fpr",
        "q_events_inter_arrival",
        "q_llm_keyword_stuffing",
        "q_llm_filter_funnel",
        "q_events_burst_episodes",
        "q_privacy_cell_suppression",
        "q_agg_bivariate",
        "q_llm_data_card",
        "q_kinesis_reshard_plan",
        "q_canary_month_trunc",
        "q_llm_quality_len_matrix",
        "q_win_running_distinct",
        "q_customer_tier_migration",
        "q_agg_welch_t",
        "q_llm_shingle_df_audit",
    }
)

DRIVER_WINDOW = 50


def _ordered():
    registry.load_all()
    return registry._ordered_names()


def _priority(name: str) -> int:
    return registry._PRIORITY[name][0]


def _sampled_through(last_round: int) -> set[str]:
    sampled: set[str] = set()
    for r in range(1, last_round + 1):
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):  # pragma: no cover - driver artifact
            pytest.skip(f"missing {path}")
        with open(path) as f:
            sampled |= set(json.load(f))
    return sampled


def test_never_sampled_set_is_empty_after_r6():
    """The r6 rotation closed the sampling debt: every query registered
    through round 6 has a CORRECTNESS row. Recomputed, not copied."""
    registry.load_all()
    never = (
        set(registry._QUERIES) - _sampled_through(6) - ROUND7_NEW_THIS_ROUND
    )
    assert never == set(), f"never-sampled after r6: {sorted(never)}"


def test_recheck_set_matches_correctness_history():
    """The re-check list IS the set of non-green oracled rows, recomputed
    from the artifacts (rows-only ``no_oracle`` rows are sampled-clean,
    not red — their gates are the recall/error-bound pytest assertions)."""
    latest: dict[str, dict] = {}
    for r in range(1, 7):
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        with open(path) as f:
            latest.update(json.load(f))
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
    assert reds == ROUND7_RECHECK


def test_recheck_heads_the_window_then_canaries():
    names = _ordered()
    assert names[0] == "q_cusum_changepoint"
    assert _priority(names[0]) == 0
    head = names[1:14]
    assert all(n.startswith("q_canary_") for n in head), head
    assert all(_priority(n) == 10 for n in head)


def test_window_budget_not_overflowed_by_new_queries():
    """Every entry with priority <=30 must fit in the 50-slot window.

    1 re-check + 13 canaries = 14 reserved slots; at most 36 new p30
    queries fit. Registering a 38th would push something out silently —
    this test makes it loud instead.
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
    """ROUND7_NEW_THIS_ROUND == (registered queries without any driver
    row) — the r6 lesson (ADVICE r6 #1): the constant must be updated with
    EVERY new @query, or the recomputation tests above drift."""
    registry.load_all()
    unsampled = set(registry._QUERIES) - _sampled_through(6)
    assert unsampled == ROUND7_NEW_THIS_ROUND


def test_new_queries_land_inside_the_window():
    registry.load_all()
    for n in sorted(ROUND7_NEW_THIS_ROUND):
        assert n in registry._QUERIES, f"{n} listed but not registered"
        if n.startswith("q_canary_"):
            assert _priority(n) == 10, f"{n}: expected canary p10"
        else:
            assert _priority(n) in (30, 35), f"{n}: expected p30/p35"
    names = _ordered()
    window = set(names[:DRIVER_WINDOW])
    missing = ROUND7_NEW_THIS_ROUND - window
    assert not missing, f"new queries outside the window: {sorted(missing)}"


def test_every_ever_green_query_pinned_at_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of an unsampled one. Exceptions: the
    canaries (always 10) and the re-check set (0 this round)."""
    registry.load_all()
    for n in sorted(_sampled_through(6) & set(registry._QUERIES)):
        p = _priority(n)
        if n in ROUND7_RECHECK:
            assert p == 0, f"{n}: red must re-enter at 0, got {p}"
        else:
            assert p in (10, 100), f"{n}: ever-sampled but priority {p}"
