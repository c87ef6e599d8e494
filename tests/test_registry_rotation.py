"""Round-14 rotation window assertions (VERDICT r13 items #1, #2).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-13 proved the rotation must be
*recomputed* (not guessed) each round from the committed CORRECTNESS
artifacts. Through round 13 the cumulative ledger is fully green and — for
the first time — EVERY registered query has a driver row at its declared
oracle level. The round-14 window:

  head slots      the round-14 additions (override 8) — the zero-lag
                  staging rule made PERMANENT (item #2): any new @query
                  lands with a driver slot in the SAME round, asserted
                  structurally below (test_zero_lag_staging_invariant)
  next slot       the re-verify tranche (override 9): q_ts_stl_decompose's
                  trend window gained the dense-calendar gate (ADVICE
                  r13) — a semantics change, so its r13 row is stale
  then 5 slots    canary 3-round refresh: the 5 canaries last sampled in
                  r11 (override 10); q_canary_array_semantics (r12)
                  waits for r15
  rest            freshness rotation (override 12): q_win_time_range (the
                  last r3-era row) plus the r4-era cohort — item #1
                  drained to within the mid-round displacements
                  (DEFERRED_TO_R15 head the r15 queue)

Rows-only half-frequency rule (VERDICT r11 item #2): a no_oracle query
that has already run clean >=2x under the driver burns no further window
slots — asserted below as "the window contains no such query" (only
q_agg_approx_distinct and q_agg_percentile_approx remain rows-only).
"""

from __future__ import annotations

import json
import os
import re

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAST_DRIVER_ROUND = 13
DRIVER_WINDOW = 50

# Queries first registered in round 14: staged into the window at override
# 8 (no driver row yet by construction). Keep in sync as operators land —
# test_zero_lag_staging_invariant recomputes the set from the artifacts.
ROUND14_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_kinesis_cost_plan",  # A20
        "q_kinesis_kpl_plan",  # A21 (mid-round)
        "q_llm_media_dims_riff",  # C177
        "q_llm_media_dims_pdf",  # C178
        "q_llm_media_dims_mp4",  # C179 (mid-round)
        "q_ts_macd",  # B213
        "q_ts_atr",  # B214 (mid-round)
        "q_ts_stochastic",  # B215 (mid-round)
    }
)

# Each MID-round addition displaces one r4-era freshness name (the window
# is exactly 50 slots and the additions must stage zero-lag): the
# displaced names stay pinned at 100 and HEAD the round-15 freshness
# queue. One name per addition beyond the 4 the round opened with.
DEFERRED_TO_R15: frozenset[str] = frozenset(
    {
        "q_agg_boolcond",
        "q_agg_decimal",
        "q_agg_listagg",
        "q_sort_nulls_first",
    }
)

# Queries whose driver row predates their CURRENT semantics (the
# override-9 tranche): the STL trend window gained the dense-calendar
# dspan gate this round, which changes output on sparse series.
REWIRED: frozenset[str] = frozenset({"q_ts_stl_decompose"})

NEW_COUNT = len(ROUND14_NEW_THIS_ROUND)
REWIRED_COUNT = len(REWIRED)  # 1
CANARY_REFRESH_ROUND = 11  # cohort last sampled r11 re-enters (3-round rule)
CANARY_REFRESH_COUNT = 5
FRESHNESS_TRANCHE_COUNT = (
    DRIVER_WINDOW - NEW_COUNT - REWIRED_COUNT - CANARY_REFRESH_COUNT
)


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
    for r in range(1, LAST_DRIVER_ROUND + 1):
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):  # pragma: no cover - driver artifact
            pytest.skip(f"missing {path}")
        with open(path) as f:
            for q in json.load(f):
                last[q] = r
    return last


def _rows_only_clean_counts() -> dict[str, int]:
    """Per-query count of clean no_oracle driver rows across all rounds."""
    counts: dict[str, int] = {}
    for r in range(1, LAST_DRIVER_ROUND + 1):
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):  # pragma: no cover - driver artifact
            pytest.skip(f"missing {path}")
        with open(path) as f:
            for q, row in json.load(f).items():
                if row.get("err") == "no_oracle":
                    counts[q] = counts.get(q, 0) + 1
    return counts


def _canary_refresh() -> set[str]:
    last = _last_sampled()
    return {
        q
        for q, r in last.items()
        if q.startswith("q_canary_") and r == CANARY_REFRESH_ROUND
    }


def _freshness_tranche() -> set[str]:
    """The oldest-last-sampled queries (the r3 remainder, then the whole
    r4 cohort), minus anything already in another tranche."""
    last = _last_sampled()
    registry.load_all()
    taken = REWIRED | _canary_refresh()
    queue: set[str] = set()
    for r in (3, 4):
        queue |= {
            q
            for q, lr in last.items()
            if lr == r and q in registry._QUERIES and q not in taken
        }
    return queue - DEFERRED_TO_R15


def test_no_reds_to_recheck():
    """The cumulative ledger through round 13 is fully green — no query
    carries override 0 (rows-only ``no_oracle`` rows are sampled-clean)."""
    latest = _rows_through(LAST_DRIVER_ROUND)
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


def test_every_query_has_been_driver_sampled():
    """Round 13 closed the backlog: every query registered BEFORE this
    round has a driver row (the only unsampled queries are this round's
    own additions, staged at the front of the window)."""
    registry.load_all()
    unsampled = set(registry._QUERIES) - set(
        _rows_through(LAST_DRIVER_ROUND)
    )
    assert unsampled == ROUND14_NEW_THIS_ROUND, (
        sorted(unsampled - ROUND14_NEW_THIS_ROUND),
        sorted(ROUND14_NEW_THIS_ROUND - unsampled),
    )


def test_zero_lag_staging_invariant():
    """VERDICT r13 item #2's Done bar, the PERMANENT rule: every query
    with no driver row (i.e. every addition of the current round) must be
    staged INSIDE the window — recomputed from the artifacts, not from a
    constant, so forgetting to stage a new @query fails here."""
    registry.load_all()
    sampled = set(_rows_through(LAST_DRIVER_ROUND))
    window = set(_ordered()[:DRIVER_WINDOW])
    unstaged = {
        n for n in registry._QUERIES if n not in sampled and n not in window
    }
    assert unstaged == set(), (
        f"additions not staged into their own round's window: "
        f"{sorted(unstaged)}"
    )


def test_round14_additions_head_the_window():
    """The round-14 additions sit at the FRONT of the window
    (override 8, slots 0..3), each with an oracle."""
    registry.load_all()
    for n in ROUND14_NEW_THIS_ROUND:
        assert _priority(n) == 8, (n, _priority(n))
        assert n in registry._ORACLES, f"{n} staged in-window without oracle"
    head = set(_ordered()[:NEW_COUNT])
    assert head == ROUND14_NEW_THIS_ROUND, sorted(head)


def test_rewired_tranche_follows_additions():
    """Every query whose semantics changed this round re-verifies THIS
    round (override 9, slot 4): the STL dense-calendar gate."""
    registry.load_all()
    for n in REWIRED:
        assert n in registry._ORACLES
        assert _priority(n) == 9, (n, _priority(n))
    names = _ordered()
    mid = names[NEW_COUNT : NEW_COUNT + REWIRED_COUNT]
    assert set(mid) == set(REWIRED), (sorted(mid), sorted(REWIRED))


def test_canary_cohort_on_three_round_refresh():
    """The r11-sampled canary cohort re-enters on the 3-round refresh
    (override 10, slots 5..9); every other canary stays pinned at 100."""
    cohort = _canary_refresh()
    assert len(cohort) == CANARY_REFRESH_COUNT, sorted(cohort)
    names = _ordered()
    lo = NEW_COUNT + REWIRED_COUNT
    mid = names[lo : lo + CANARY_REFRESH_COUNT]
    assert set(mid) == cohort, (sorted(mid), sorted(cohort))
    registry.load_all()
    for n in registry._QUERIES:
        if n.startswith("q_canary_"):
            assert _priority(n) == (10 if n in cohort else 100), n


def test_freshness_tranche_drains_r3_and_r4_completely():
    """Remaining slots: the last r3-era row (q_win_time_range) and the
    r4-era cohort re-enter at override 12 — VERDICT r13 item #1's Done
    bar ("the oldest ~30 of the r4 cohort") exceeded, minus exactly the
    names each mid-round addition displaced (DEFERRED_TO_R15, pinned at
    100, heading the r15 queue)."""
    tranche = _freshness_tranche()
    assert len(tranche) == FRESHNESS_TRANCHE_COUNT
    assert "q_win_time_range" in tranche
    last = _last_sampled()
    assert {q for q, r in last.items() if r <= 4} - tranche == DEFERRED_TO_R15
    registry.load_all()
    for n in DEFERRED_TO_R15:
        assert _priority(n) == 100, (n, _priority(n))
    names = _ordered()
    lo = NEW_COUNT + REWIRED_COUNT + CANARY_REFRESH_COUNT
    tail = names[lo : lo + FRESHNESS_TRANCHE_COUNT]
    assert set(tail) == tranche, (sorted(tail), sorted(tranche))
    assert all(_priority(n) == 12 for n in tail)


def test_window_composition_exact():
    """additions + 1 rewired + 5 canaries + freshness = the exact
    50-slot window."""
    names = _ordered()
    window = set(names[:DRIVER_WINDOW])
    expect = (
        ROUND14_NEW_THIS_ROUND
        | set(REWIRED)
        | _canary_refresh()
        | _freshness_tranche()
    )
    assert window == expect, (
        sorted(window - expect),
        sorted(expect - window),
    )
    assert _priority(names[DRIVER_WINDOW]) == 100


def test_rows_only_half_frequency_rule():
    """VERDICT r11 item #2's Done bar, still enforced: the window contains
    no rows-only query that has already run clean >=2x under the driver."""
    registry.load_all()
    oracled = set(registry._ORACLES)
    counts = _rows_only_clean_counts()
    window = set(_ordered()[:DRIVER_WINDOW])
    offenders = sorted(
        q for q in window if q not in oracled and counts.get(q, 0) >= 2
    )
    assert offenders == [], (
        f"confirmed rows-only queries re-burning window slots: {offenders}"
    )


def test_every_ever_sampled_query_pinned_at_9_10_12_or_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of the rotation plan."""
    registry.load_all()
    fresh = _freshness_tranche()
    canaries = _canary_refresh()
    for n in sorted(
        set(_rows_through(LAST_DRIVER_ROUND)) & set(registry._QUERIES)
    ):
        p = _priority(n)
        if n in REWIRED:
            assert p == 9, f"{n}: rewired tranche must be 9, got {p}"
        elif n in canaries:
            assert p == 10, f"{n}: canary refresh must be 10, got {p}"
        elif n in fresh:
            assert p == 12, f"{n}: freshness tranche must be 12, got {p}"
        else:
            assert p == 100, f"{n}: ever-sampled but priority {p}"


# ---------------------------------------------------------------------------
# SURVEY §2 inventory arithmetic (VERDICT r8 item #7): the inventory
# paragraph is the judged contract — assert it against the live registry so
# a new @query (or a dropped oracle) cannot silently drift the prose.
# ---------------------------------------------------------------------------


def _survey_inventory() -> dict[str, int | set[str]]:
    with open(os.path.join(REPO, "SURVEY.md")) as f:
        text = f.read()
    m = re.search(
        r"\*\*Inventory count \(round \d+\): (\d+) Tier A \+ (\d+) Tier B"
        r".*?\+ (\d+) Tier C.*?\+ (\d+) Tier D rows; (\d+) SQL-oracled"
        r" query names.*?(\d+) rows-only\s*\(([^)]*)\)",
        text,
        re.S,
    )
    assert m, "SURVEY.md inventory paragraph not found / format drifted"
    rows_only = set(re.findall(r"`(q_\w+)`", m.group(7)))
    return {
        "tier_a": int(m.group(1)),
        "tier_b": int(m.group(2)),
        "tier_c": int(m.group(3)),
        "tier_d": int(m.group(4)),
        "oracled": int(m.group(5)),
        "rows_only_n": int(m.group(6)),
        "rows_only": rows_only,
        "queries": int(
            re.search(r"registry reality (\d+) queries", text).group(1)
        ),
        "oracles": int(
            re.search(r"registry reality \d+ queries / (\d+) oracles", text)
            .group(1)
        ),
    }


def test_survey_inventory_matches_registry():
    inv = _survey_inventory()
    registry.load_all()
    queries = set(registry._QUERIES)
    oracles = set(registry._ORACLES)
    assert len(queries) == inv["queries"], (len(queries), inv["queries"])
    assert len(oracles) == inv["oracles"], (len(oracles), inv["oracles"])
    assert inv["oracled"] == inv["oracles"], "prose oracle counts disagree"
    rows_only = queries - oracles
    assert rows_only == inv["rows_only"], (
        sorted(rows_only - inv["rows_only"]),
        sorted(inv["rows_only"] - rows_only),
    )
    assert inv["rows_only_n"] == len(inv["rows_only"])
    assert inv["queries"] == inv["oracles"] + inv["rows_only_n"]


def test_survey_tier_sum_consistent():
    """Tier rows = query-backed rows + harness-only rows. VERDICT r8:
    pinned constants, updated only when a harness-only row or a shared-row
    query is added."""
    inv = _survey_inventory()
    rows_total = inv["tier_a"] + inv["tier_b"] + inv["tier_c"] + inv["tier_d"]
    registry.load_all()
    HARNESS_ONLY_ROWS = 25  # ... +B213s MACD twin, +B214s ATR twin (r14)
    EXTRA_QUERIES_ON_SHARED_ROWS = 6
    assert rows_total == len(registry._QUERIES) + HARNESS_ONLY_ROWS - (
        EXTRA_QUERIES_ON_SHARED_ROWS
    ), (rows_total, len(registry._QUERIES))
