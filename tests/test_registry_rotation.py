"""Round-12 rotation window assertions (VERDICT r11 items #1 and #2).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-11 proved the rotation must be
*recomputed* (not guessed) each round from the committed CORRECTNESS
artifacts. Through round 11 the cumulative ledger is fully green; the only
queries without a driver row are the 27 round-11 priority-30 additions, and
four queries carry driver rows that PREDATE their current SQL oracle
(q_llm_sim_lsh / q_llm_sim_ivf oracled in r11; q_llm_dedup_minhash,
q_llm_heavy_hitters_sketch and q_llm_ingest_neardup promoted
rows-only→SQL in r12). The round-12
window drains both backlogs and resumes the freshness rotation:

  slots 0..26     the 27 never-driver-sampled round-11 additions
                  (override 8)
  slots 27..31    the 5 re-oracled queries (override 9) — after this round
                  every registry query's latest driver row is
                  post-current-oracle
  slots 32..49    freshness rotation: the 18 oldest round-3-last-sampled
                  queries, alphabetical (override 12); the other 20 r3-era
                  queries queue for round 13

Canary cadence: all 18 canaries were re-sampled green in r10/r11 and pin at
100; the r10 cohort re-enters in round 13 (3-round refresh).

Rows-only half-frequency rule (VERDICT r11 item #2): a no_oracle query that
has already run clean >=2x under the driver burns no further window slots
until the freshness queue has fully rotated — asserted below as "the window
contains no such query".

New round-12 queries use decorator ``priority=30``: behind the window,
ahead of every pinned-100 query — they take their first driver rows in
round 13. Add their names to ROUND12_NEW_THIS_ROUND below; the recompute
tests fail loudly on drift.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAST_DRIVER_ROUND = 11
DRIVER_WINDOW = 50

# Queries first registered in round 12 (decorator priority=30): they have no
# CORRECTNESS row yet by construction. Keep in sync as operators land.
ROUND12_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_ts_holt_winters_mul",  # B208
        "q_llm_substring_sketch",  # C110s
        "q_kinesis_efo_plan",  # A17
        "q_ts_croston",  # B209
        "q_events_did",  # B210
        "q_llm_media_dims",  # C174
    }
)

# Queries whose driver row predates their CURRENT oracle (the r12 window's
# override-9 tranche): sim_lsh/sim_ivf gained SQL oracles in round 11 after
# their last rows; minhash and the heavy-hitters sketch were promoted from
# rows-only to SQL in round 12.
REORACLED: frozenset[str] = frozenset(
    {
        "q_llm_sim_lsh",
        "q_llm_sim_ivf",
        "q_llm_dedup_minhash",
        "q_llm_heavy_hitters_sketch",
        "q_llm_ingest_neardup",
    }
)

NEVER_SAMPLED_COUNT = 27  # the round-11 priority-30 additions
REORACLED_COUNT = 5
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
        - ROUND12_NEW_THIS_ROUND
    )


def _freshness_tranche() -> list[str]:
    """First 19 (alphabetical) of the round-3-last-sampled cohort, minus
    any member promoted into the re-oracled tranche."""
    last = _last_sampled()
    registry.load_all()
    r3 = sorted(
        q
        for q, r in last.items()
        if r == 3 and q in registry._QUERIES and q not in REORACLED
    )
    assert len(r3) == 38, f"r3-era cohort drifted: {len(r3)}"
    return r3[:FRESHNESS_TRANCHE_COUNT]


def test_no_reds_to_recheck():
    """The cumulative ledger through round 11 is fully green — no query
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
    """VERDICT r11 item #1's Done bar, part 1: every one of the 27
    never-sampled round-11 additions sits at the FRONT of the window
    (override 8, slots 0..26)."""
    never = _never_sampled()
    assert len(never) == NEVER_SAMPLED_COUNT, f"backlog drifted: {len(never)}"
    for n in sorted(never):
        assert _priority(n) == 8, (n, _priority(n))
    head = set(_ordered()[:NEVER_SAMPLED_COUNT])
    assert head == never, (sorted(head - never), sorted(never - head))


def test_reoracled_tranche_follows_backlog():
    """VERDICT r11 item #1's Done bar, part 2: the 4 queries whose driver
    rows predate their current oracle take slots 27..30 (override 9), so
    a silent engine divergence in the promoted oracles surfaces THIS
    round."""
    assert len(REORACLED) == REORACLED_COUNT
    registry.load_all()
    oracles = set(registry._ORACLES)
    for n in REORACLED:
        assert n in oracles, f"{n} listed as re-oracled but has no oracle"
        assert _priority(n) == 9, (n, _priority(n))
    names = _ordered()
    mid = names[NEVER_SAMPLED_COUNT : NEVER_SAMPLED_COUNT + REORACLED_COUNT]
    assert set(mid) == set(REORACLED), (sorted(mid), sorted(REORACLED))


def test_freshness_tranche_fills_the_window():
    """Slots 31..49: the 19 oldest round-3-last-sampled queries re-enter
    at override 12."""
    tranche = _freshness_tranche()
    names = _ordered()
    tail = names[
        NEVER_SAMPLED_COUNT
        + REORACLED_COUNT : NEVER_SAMPLED_COUNT
        + REORACLED_COUNT
        + FRESHNESS_TRANCHE_COUNT
    ]
    assert set(tail) == set(tranche), (sorted(tail), tranche)
    assert all(_priority(n) == 12 for n in tail)


def test_window_composition_exact():
    """27 backlog + 4 re-oracled + 19 freshness = the exact 50-slot
    window."""
    assert (
        NEVER_SAMPLED_COUNT + REORACLED_COUNT + FRESHNESS_TRANCHE_COUNT
        == DRIVER_WINDOW
    )
    names = _ordered()
    window = set(names[:DRIVER_WINDOW])
    expect = _never_sampled() | set(REORACLED) | set(_freshness_tranche())
    assert window == expect, (
        sorted(window - expect),
        sorted(expect - window),
    )
    # round-12 additions (priority 30) queue directly after the window,
    # ahead of the pinned-100 majority
    after = names[DRIVER_WINDOW : DRIVER_WINDOW + len(ROUND12_NEW_THIS_ROUND)]
    assert set(after) == ROUND12_NEW_THIS_ROUND, after


def test_rows_only_half_frequency_rule():
    """VERDICT r11 item #2's Done bar: the window composition contains no
    rows-only query that has already run clean >=2x under the driver —
    confirmed no_oracle rows stop burning window slots."""
    registry.load_all()
    oracled = set(registry._ORACLES)
    counts = _rows_only_clean_counts()
    window = set(_ordered()[:DRIVER_WINDOW])
    offenders = sorted(
        q
        for q in window
        if q not in oracled and counts.get(q, 0) >= 2
    )
    assert offenders == [], (
        f"confirmed rows-only queries re-burning window slots: {offenders}"
    )


def test_canaries_on_three_round_refresh():
    """All 18 canaries were re-sampled green in r10/r11 and pin at 100
    this round (the r10 cohort re-enters in round 13) — except any canary
    that is itself a round-11 addition, which rides the backlog tranche."""
    registry.load_all()
    never = _never_sampled()
    for n in registry._QUERIES:
        if not n.startswith("q_canary_"):
            continue
        if n in never:
            assert _priority(n) == 8, (n, _priority(n))
        elif n in ROUND12_NEW_THIS_ROUND:
            assert _priority(n) == 30, (n, _priority(n))
        else:
            assert _priority(n) == 100, (n, _priority(n))


def test_new_this_round_constant_is_exact():
    """ROUND12_NEW_THIS_ROUND == (registered queries with no driver row
    that are not part of the round-11 backlog) — the r6 lesson: update the
    constant with EVERY new @query or the recompute tests drift."""
    registry.load_all()
    unsampled = set(registry._QUERIES) - set(
        _rows_through(LAST_DRIVER_ROUND)
    )
    new = unsampled - _never_sampled()
    assert new == ROUND12_NEW_THIS_ROUND, (
        sorted(new - ROUND12_NEW_THIS_ROUND),
        sorted(ROUND12_NEW_THIS_ROUND - new),
    )
    for n in sorted(ROUND12_NEW_THIS_ROUND):
        assert n in registry._QUERIES, f"{n} listed but not registered"
        assert _priority(n) == 30, (n, _priority(n))


def test_every_ever_sampled_query_pinned_at_9_12_or_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of the rotation plan."""
    registry.load_all()
    fresh = set(_freshness_tranche())
    for n in sorted(
        set(_rows_through(LAST_DRIVER_ROUND)) & set(registry._QUERIES)
    ):
        p = _priority(n)
        if n in REORACLED:
            assert p == 9, f"{n}: re-oracled tranche must be 9, got {p}"
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
    345 rows = 327 query-backed rows (-> 333 registry queries, i.e. 6
    extra query names on shared rows: A7's second decode, C37's sketch,
    A9/B42 sharing q_set_union_all, etc.) + 18 harness-only rows. Pinned
    constants, updated only when a harness-only row or a shared-row query
    is added."""
    inv = _survey_inventory()
    rows_total = inv["tier_a"] + inv["tier_b"] + inv["tier_c"] + inv["tier_d"]
    registry.load_all()
    HARNESS_ONLY_ROWS = 22  # +B163s (r9), +B194s/+B202s/+B203s (r11 twins)
    EXTRA_QUERIES_ON_SHARED_ROWS = 6
    assert rows_total == len(registry._QUERIES) + HARNESS_ONLY_ROWS - (
        EXTRA_QUERIES_ON_SHARED_ROWS
    ), (rows_total, len(registry._QUERIES))
