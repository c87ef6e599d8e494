"""Round-10 rotation window assertions (VERDICT r9 items #1/#2).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-9 proved the rotation must be
*recomputed* (not guessed) each round from the committed CORRECTNESS
artifacts. Through round 9 the cumulative ledger is fully green, and 20
registered queries carry no driver row yet (the 18 round-9 priority-30
additions plus the two a3920c0 snapshot queries). The round-10 window
drains that backlog completely and resumes the freshness rotation:

  slots 0..19     the 20 never-driver-sampled queries (override 8) — after
                  this round the ENTIRE registry is driver-confirmed
  slots 20..31    the 12 legacy canaries last sampled round 7, at their
                  permanent priority 10 (D1/D14/D15 re-sampled green in r9
                  pin at 100 for one round; D16 rides the backlog tranche)
  slots 32..49    freshness rotation: the first 18 (alphabetical) of the
                  35 round-2-last-sampled queries (override 12); the other
                  17 queue for round 11

New round-10 queries use decorator ``priority=30``: behind the window,
ahead of every pinned-100 query — they take their first driver rows in
round 11. Add their names to ROUND10_NEW_THIS_ROUND below; the recompute
tests fail loudly on drift.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAST_DRIVER_ROUND = 9
DRIVER_WINDOW = 50

# Queries first registered in round 10 (decorator priority=30): they have no
# CORRECTNESS row yet by construction. Keep in sync as operators land.
ROUND10_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_events_logrank",
        "q_ts_lttb",
        "q_llm_url_host_audit",
        "q_canary_add_months",
        "q_ts_theil_sen",
        "q_events_proportion_ztest",
        "q_llm_readability",
        "q_llm_whitespace_anomaly",
        "q_geo_geofence",
        "q_ts_hurst",
        "q_llm_code_detect",
        "q_win_drawdown",
        "q_llm_dedup_shard_locality",
        "q_join_interval_bucketed",
        "q_events_decay_engagement",
        "q_agg_paired_ttest",
        "q_llm_token_yield_funnel",
        "q_agg_bootstrap_ci",
        "q_canary_regex_subset",
        "q_llm_host_cap_enforce",
        "q_llm_mixture_temperature",
        "q_win_rolling_corr",
        "q_ts_mann_kendall",
        "q_ts_runs_test",
        "q_llm_unigram_entropy",
        "q_ts_fano_dispersion",
    }
)

NEVER_SAMPLED_COUNT = 18 + 2  # r9 priority-30 additions + 2 snapshot queries
CANARY_TRANCHE_COUNT = 12
FRESHNESS_TRANCHE_COUNT = 18


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


def _never_sampled() -> set[str]:
    registry.load_all()
    return (
        set(registry._QUERIES)
        - set(_rows_through(LAST_DRIVER_ROUND))
        - ROUND10_NEW_THIS_ROUND
    )


def _legacy_canary_tranche() -> list[str]:
    """The 12 canaries whose latest driver row is round 7 — everything
    else canary-shaped was re-sampled in round 9 (D1/D14/D15) or rides
    the never-sampled backlog (D16)."""
    last = _last_sampled()
    return sorted(
        q
        for q, r in last.items()
        if q.startswith("q_canary_") and r == 7
    )


def _freshness_tranche() -> list[str]:
    """First 18 (alphabetical) of the round-2-last-sampled queries."""
    last = _last_sampled()
    registry.load_all()
    r2 = sorted(
        q for q, r in last.items() if r == 2 and q in registry._QUERIES
    )
    assert len(r2) == 35, f"r2-era cohort drifted: {len(r2)}"
    return r2[:FRESHNESS_TRANCHE_COUNT]


def test_no_reds_to_recheck():
    """The cumulative ledger through round 9 is fully green — no query
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


def test_never_sampled_backlog_heads_the_window():
    """VERDICT r9 item #2's Done bar: every one of the 20 never-sampled
    queries sits at the FRONT of the window (override 8, slots 0..19) —
    including the two a3920c0 snapshot queries."""
    never = _never_sampled()
    assert len(never) == NEVER_SAMPLED_COUNT, f"backlog drifted: {len(never)}"
    assert {"q_win_rolling_median", "q_llm_epoch_schedule"} <= never
    for n in sorted(never):
        assert _priority(n) == 8, (n, _priority(n))
    head = set(_ordered()[:NEVER_SAMPLED_COUNT])
    assert head == never, (sorted(head - never), sorted(never - head))


def test_canary_tranche_follows_backlog():
    """The 12 round-7-last-sampled legacy canaries take slots 20..31 at
    their permanent priority 10; the three canaries re-sampled green in
    round 9 pin at 100 for one round; D16 rides the backlog tranche."""
    tranche = _legacy_canary_tranche()
    assert len(tranche) == CANARY_TRANCHE_COUNT
    names = _ordered()
    mid = names[NEVER_SAMPLED_COUNT : NEVER_SAMPLED_COUNT + CANARY_TRANCHE_COUNT]
    assert set(mid) == set(tranche), (sorted(mid), tranche)
    assert all(_priority(n) == 10 for n in mid)
    registry.load_all()
    for n in registry._QUERIES:
        if not n.startswith("q_canary_"):
            continue
        if n in tranche:
            continue
        if n == "q_canary_unicode_case":
            assert _priority(n) == 8, (n, _priority(n))
        elif n in ROUND10_NEW_THIS_ROUND:
            assert _priority(n) == 30, (n, _priority(n))
        else:  # D1/D14/D15, re-sampled green in round 9
            assert _priority(n) == 100, (n, _priority(n))


def test_freshness_tranche_fills_the_window():
    """Slots 32..49: the 18 oldest (round-2-last-sampled, alphabetical)
    queries re-enter at override 12."""
    tranche = _freshness_tranche()
    names = _ordered()
    tail = names[
        NEVER_SAMPLED_COUNT
        + CANARY_TRANCHE_COUNT : DRIVER_WINDOW
    ]
    assert set(tail) == set(tranche), (sorted(tail), tranche)
    assert all(_priority(n) == 12 for n in tail)


def test_window_composition_exact():
    """20 backlog + 12 canaries + 18 freshness = the exact 50-slot window."""
    assert (
        NEVER_SAMPLED_COUNT + CANARY_TRANCHE_COUNT + FRESHNESS_TRANCHE_COUNT
        == DRIVER_WINDOW
    )
    names = _ordered()
    window = set(names[:DRIVER_WINDOW])
    expect = (
        _never_sampled()
        | set(_legacy_canary_tranche())
        | set(_freshness_tranche())
    )
    assert window == expect, (
        sorted(window - expect),
        sorted(expect - window),
    )
    # round-10 additions (priority 30) queue directly after the window,
    # ahead of the pinned-100 majority
    after = names[DRIVER_WINDOW : DRIVER_WINDOW + len(ROUND10_NEW_THIS_ROUND)]
    assert set(after) == ROUND10_NEW_THIS_ROUND, after


def test_new_this_round_constant_is_exact():
    """ROUND10_NEW_THIS_ROUND == (registered queries with no driver row
    that are not part of the round-9 backlog) — the r6 lesson: update the
    constant with EVERY new @query or the recompute tests drift."""
    registry.load_all()
    unsampled = set(registry._QUERIES) - set(
        _rows_through(LAST_DRIVER_ROUND)
    )
    new = unsampled - _never_sampled()
    assert new == ROUND10_NEW_THIS_ROUND, (
        sorted(new - ROUND10_NEW_THIS_ROUND),
        sorted(ROUND10_NEW_THIS_ROUND - new),
    )
    for n in sorted(ROUND10_NEW_THIS_ROUND):
        assert n in registry._QUERIES, f"{n} listed but not registered"
        assert _priority(n) == 30, (n, _priority(n))


def test_every_ever_sampled_query_pinned_at_10_12_or_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of the rotation plan."""
    registry.load_all()
    fresh = set(_freshness_tranche())
    canaries = set(_legacy_canary_tranche())
    for n in sorted(
        set(_rows_through(LAST_DRIVER_ROUND)) & set(registry._QUERIES)
    ):
        p = _priority(n)
        if n in fresh:
            assert p == 12, f"{n}: freshness tranche must be 12, got {p}"
        elif n in canaries:
            assert p == 10, f"{n}: canary tranche must be 10, got {p}"
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
    345 rows = 327 query-backed rows (-> 333 registry queries, i.e. 6
    extra query names on shared rows: A7's second decode, C37's sketch,
    A9/B42 sharing q_set_union_all, etc.) + 18 harness-only rows. Pinned
    constants, updated only when a harness-only row or a shared-row query
    is added."""
    inv = _survey_inventory()
    rows_total = inv["tier_a"] + inv["tier_b"] + inv["tier_c"] + inv["tier_d"]
    registry.load_all()
    HARNESS_ONLY_ROWS = 19  # +B163s (round 9, streaming geo twin)
    EXTRA_QUERIES_ON_SHARED_ROWS = 6
    assert rows_total == len(registry._QUERIES) + HARNESS_ONLY_ROWS - (
        EXTRA_QUERIES_ON_SHARED_ROWS
    ), (rows_total, len(registry._QUERIES))
