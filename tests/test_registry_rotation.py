"""Round-13 rotation window assertions (VERDICT r12 items #1, #3, #5).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-12 proved the rotation must be
*recomputed* (not guessed) each round from the committed CORRECTNESS
artifacts. Through round 12 the cumulative ledger is fully green; the only
queries without a driver row are the 6 round-12 priority-30 additions. The
round-13 window drains that backlog, re-verifies everything whose oracle or
implementation changed this round, refreshes the overdue canary cohort, and
— for the first time — stages the CURRENT round's additions directly into
the window instead of carrying the one-round rotation lag:

  slots 0..5      the 6 never-driver-sampled round-12 additions
                  (override 8)
  slots 6..11     the re-oracled / rewired tranche (override 9): C82s'
                  rows-only→SQL promotion, the MinHash family rewired onto
                  the shared portable-signature barrier (C3/C126/C140/
                  C143), and q_llm_dedup_jaccard re-verifying the shared
                  PPJoin frame after the BIGINT token-domain change (its
                  full pair dump covers the other 13 consumers)
  slots 12..24    canary 3-round refresh: the 13 canaries last sampled in
                  r10 (override 10)
  slots 25..30    the 6 round-13 additions (override 11) — B211 STL
                  readout, B212 RSI, A18 lease plan, A19 retention plan,
                  C175 JPEG dims, C176 production-geometry band recall
  slots 31..49    freshness rotation: the 19 oldest r3-era rows
                  (override 12); q_win_time_range heads the r14 queue

Rows-only half-frequency rule (VERDICT r11 item #2): a no_oracle query
that has already run clean >=2x under the driver burns no further window
slots — asserted below as "the window contains no such query" (only
q_agg_approx_distinct and q_agg_percentile_approx remain rows-only after
the C82s promotion).
"""

from __future__ import annotations

import json
import os
import re

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAST_DRIVER_ROUND = 12
DRIVER_WINDOW = 50

# Queries first registered in round 13: staged into the window at override
# 11 (no driver row yet by construction). Keep in sync as operators land.
ROUND13_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_ts_stl_decompose",  # B211
        "q_ts_rsi",  # B212
        "q_kinesis_lease_plan",  # A18
        "q_kinesis_retention_plan",  # A19
        "q_llm_media_dims_jpeg",  # C175
        "q_llm_band_recall_24",  # C176
    }
)

# Queries whose driver row predates their CURRENT oracle or whose
# implementation was materially rewired this round (the override-9
# tranche): C82s was promoted rows-only→SQL in r13; C3/C126/C140/C143 now
# read the shared portable-signature barrier; the shared Jaccard build
# moved to the BIGINT token domain and q_llm_dedup_jaccard re-verifies it.
REWIRED: frozenset[str] = frozenset(
    {
        "q_llm_dedup_containment_lsh",
        "q_llm_dedup_jaccard",
        "q_llm_dedup_minhash",
        "q_llm_ingest_neardup",
        "q_llm_minhash_portable",
        "q_llm_band_assign",
    }
)

NEVER_SAMPLED_COUNT = 6  # the round-12 priority-30 additions
REWIRED_COUNT = 6
CANARY_REFRESH_ROUND = 10  # cohort last sampled r10 re-enters (3-round rule)
CANARY_REFRESH_COUNT = 13
R13_NEW_COUNT = 6
FRESHNESS_TRANCHE_COUNT = (
    DRIVER_WINDOW
    - NEVER_SAMPLED_COUNT
    - REWIRED_COUNT
    - CANARY_REFRESH_COUNT
    - R13_NEW_COUNT
)  # = 22


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


def _never_sampled() -> set[str]:
    registry.load_all()
    return (
        set(registry._QUERIES)
        - set(_rows_through(LAST_DRIVER_ROUND))
        - ROUND13_NEW_THIS_ROUND
    )


def _canary_refresh() -> set[str]:
    last = _last_sampled()
    return {
        q
        for q, r in last.items()
        if q.startswith("q_canary_") and r == CANARY_REFRESH_ROUND
    }


def _freshness_tranche() -> list[str]:
    """The oldest-last-sampled queries (r3 remainder, then r4 head,
    alphabetical within a round), minus anything already in another
    tranche, truncated to the remaining window slots."""
    last = _last_sampled()
    registry.load_all()
    taken = REWIRED | _canary_refresh()
    queue: list[str] = []
    for r in (3, 4):
        queue.extend(
            sorted(
                q
                for q, lr in last.items()
                if lr == r and q in registry._QUERIES and q not in taken
            )
        )
    return queue[:FRESHNESS_TRANCHE_COUNT]


def test_no_reds_to_recheck():
    """The cumulative ledger through round 12 is fully green — no query
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
    """VERDICT r12 item #1's Done bar: every one of the 6 never-sampled
    round-12 additions sits at the FRONT of the window (override 8,
    slots 0..5)."""
    never = _never_sampled()
    assert len(never) == NEVER_SAMPLED_COUNT, f"backlog drifted: {never}"
    for n in sorted(never):
        assert _priority(n) == 8, (n, _priority(n))
    head = set(_ordered()[:NEVER_SAMPLED_COUNT])
    assert head == never, (sorted(head - never), sorted(never - head))


def test_rewired_tranche_follows_backlog():
    """VERDICT r12 items #2/#3: every query whose oracle or implementation
    changed this round re-verifies THIS round (override 9, slots 6..11) —
    each must carry an oracle (the C82s promotion included)."""
    assert len(REWIRED) == REWIRED_COUNT
    registry.load_all()
    oracles = set(registry._ORACLES)
    for n in REWIRED:
        assert n in oracles, f"{n} in the rewired tranche but has no oracle"
        assert _priority(n) == 9, (n, _priority(n))
    names = _ordered()
    mid = names[NEVER_SAMPLED_COUNT : NEVER_SAMPLED_COUNT + REWIRED_COUNT]
    assert set(mid) == set(REWIRED), (sorted(mid), sorted(REWIRED))


def test_canary_cohort_on_three_round_refresh():
    """VERDICT r12 item #5: the r10-sampled canary cohort re-enters on the
    3-round refresh (override 10, slots 12..24); every other canary stays
    pinned at 100."""
    cohort = _canary_refresh()
    assert len(cohort) == CANARY_REFRESH_COUNT, sorted(cohort)
    names = _ordered()
    lo = NEVER_SAMPLED_COUNT + REWIRED_COUNT
    mid = names[lo : lo + CANARY_REFRESH_COUNT]
    assert set(mid) == cohort, (sorted(mid), sorted(cohort))
    registry.load_all()
    for n in registry._QUERIES:
        if n.startswith("q_canary_"):
            assert _priority(n) == (10 if n in cohort else 100), n


def test_round13_additions_staged_inside_the_window():
    """The structural one-round rotation lag is CLOSED this round: the 3
    round-13 additions take window slots (override 11, slots 25..27)
    instead of queueing behind it."""
    registry.load_all()
    names = _ordered()
    lo = NEVER_SAMPLED_COUNT + REWIRED_COUNT + CANARY_REFRESH_COUNT
    mid = names[lo : lo + R13_NEW_COUNT]
    assert set(mid) == ROUND13_NEW_THIS_ROUND, mid
    for n in ROUND13_NEW_THIS_ROUND:
        assert _priority(n) == 11, (n, _priority(n))
        assert n in registry._ORACLES, f"{n} staged in-window without oracle"


def test_freshness_tranche_fills_the_window():
    """Slots 31..49: the 19 oldest remaining r3-era rows re-enter at
    override 12 (exactly one r3 row — q_win_time_range — stays queued
    for round 14; the window has 19 slots left after staging all six
    round-13 additions)."""
    tranche = _freshness_tranche()
    assert len(tranche) == FRESHNESS_TRANCHE_COUNT
    names = _ordered()
    lo = (
        NEVER_SAMPLED_COUNT
        + REWIRED_COUNT
        + CANARY_REFRESH_COUNT
        + R13_NEW_COUNT
    )
    tail = names[lo : lo + FRESHNESS_TRANCHE_COUNT]
    assert set(tail) == set(tranche), (sorted(tail), sorted(tranche))
    assert all(_priority(n) == 12 for n in tail)
    # the r3-era queue drains to exactly ONE member this round
    last = _last_sampled()
    r3_left = {q for q, r in last.items() if r == 3} - set(tranche) - REWIRED
    assert r3_left == {"q_win_time_range"}, sorted(r3_left)


def test_window_composition_exact():
    """6 backlog + 6 rewired + 13 canaries + 6 round-13 additions + 19
    freshness = the exact 50-slot window."""
    names = _ordered()
    window = set(names[:DRIVER_WINDOW])
    expect = (
        _never_sampled()
        | set(REWIRED)
        | _canary_refresh()
        | ROUND13_NEW_THIS_ROUND
        | set(_freshness_tranche())
    )
    assert window == expect, (
        sorted(window - expect),
        sorted(expect - window),
    )


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


def test_new_this_round_constant_is_exact():
    """ROUND13_NEW_THIS_ROUND == (registered queries with no driver row
    that are not part of the round-12 backlog) — the r6 lesson: update the
    constant with EVERY new @query or the recompute tests drift."""
    registry.load_all()
    unsampled = set(registry._QUERIES) - set(
        _rows_through(LAST_DRIVER_ROUND)
    )
    new = unsampled - _never_sampled()
    assert new == ROUND13_NEW_THIS_ROUND, (
        sorted(new - ROUND13_NEW_THIS_ROUND),
        sorted(ROUND13_NEW_THIS_ROUND - new),
    )
    for n in sorted(ROUND13_NEW_THIS_ROUND):
        assert n in registry._QUERIES, f"{n} listed but not registered"


def test_every_ever_sampled_query_pinned_at_9_10_12_or_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of the rotation plan."""
    registry.load_all()
    fresh = set(_freshness_tranche())
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
    HARNESS_ONLY_ROWS = 23  # ... +B194s/B202s/B203s (r11), +B212s (r13)
    EXTRA_QUERIES_ON_SHARED_ROWS = 6
    assert rows_total == len(registry._QUERIES) + HARNESS_ONLY_ROWS - (
        EXTRA_QUERIES_ON_SHARED_ROWS
    ), (rows_total, len(registry._QUERIES))
