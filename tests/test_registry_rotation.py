"""Round-11 rotation window assertions (VERDICT r10 item #1).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-10 proved the rotation must be
*recomputed* (not guessed) each round from the committed CORRECTNESS
artifacts. Through round 10 the cumulative ledger is fully green, and the
only queries without a driver row are the 26 round-10 priority-30
additions. The round-11 window drains that backlog and resumes the
freshness rotation:

  slots 0..25     the 26 never-driver-sampled round-10 additions
                  (override 8) — after this round the ENTIRE registry is
                  driver-confirmed
  slots 26..28    D1/D14/D15, last sampled round 9, back at their
                  permanent priority 10 (the 12 r7-era canaries were
                  re-sampled green in r10 and pin at 100)
  slots 29..45    freshness rotation: the 17 remaining round-2-last-sampled
                  queries (override 12)
  slots 46..49    window fill: the 4 oldest round-3-last-sampled queries,
                  alphabetical (override 14); the other 39 r3-era queries
                  queue for round 12

New round-11 queries use decorator ``priority=30``: behind the window,
ahead of every pinned-100 query — they take their first driver rows in
round 12. Add their names to ROUND11_NEW_THIS_ROUND below; the recompute
tests fail loudly on drift.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAST_DRIVER_ROUND = 10
DRIVER_WINDOW = 50

# Queries first registered in round 11 (decorator priority=30): they have no
# CORRECTNESS row yet by construction. Keep in sync as operators land.
ROUND11_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_ts_seasonal_forecast",  # B190
        "q_events_seq_patterns",  # B191
        "q_events_attribution",  # B192
        "q_events_lifecycle",  # B193
        "q_kinesis_lag_audit",  # A15
        "q_win_bollinger",  # B194
        "q_part_abc_xyz",  # B195
        "q_llm_cluster_keep_best",  # C168
        "q_geo_dbscan",  # B196
        "q_ts_forecast_backtest",  # B197
        "q_cohort_ltv",  # B199
        "q_part_safety_stock",  # B198
        "q_sales_pvm_bridge",  # B200
        "q_part_price_elasticity",  # B201
        "q_orders_littles_law",  # B202
        "q_llm_embed_isotropy",  # C169
        "q_llm_cluster_tightness",  # C170
        "q_ts_holt_linear",  # B203
        "q_llm_dedup_method_overlap",  # C171
        "q_kinesis_hotkey_audit",  # A16
        "q_llm_pq_distortion",  # C172
        "q_canary_array_semantics",  # D19
        "q_trade_flow_matrix",  # B204
        "q_events_cuped",  # B205
        "q_events_mde",  # B206
        "q_orders_priority_aging",  # B207
        "q_llm_source_vocab_overlap",  # C173
    }
)

NEVER_SAMPLED_COUNT = 26  # the round-10 priority-30 additions
CANARY_TRANCHE_COUNT = 3
FRESHNESS_TRANCHE_COUNT = 17
R3_FILL_COUNT = 4


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
        - ROUND11_NEW_THIS_ROUND
    )


def _legacy_canary_tranche() -> list[str]:
    """The 3 canaries whose latest driver row is round 9 (D1/D14/D15) —
    the 12 r7-era canaries were re-sampled green in round 10 and pin at
    100; D16/D17/D18 ride other tranches."""
    last = _last_sampled()
    return sorted(
        q
        for q, r in last.items()
        if q.startswith("q_canary_") and r == 9
    )


def _freshness_tranche() -> list[str]:
    """All 17 remaining round-2-last-sampled queries (the other half of
    the round-10 freshness tranche)."""
    last = _last_sampled()
    registry.load_all()
    r2 = sorted(
        q for q, r in last.items() if r == 2 and q in registry._QUERIES
    )
    assert len(r2) == FRESHNESS_TRANCHE_COUNT, f"r2-era cohort drifted: {len(r2)}"
    return r2


def _r3_fill_tranche() -> list[str]:
    """First 4 (alphabetical) of the round-3-last-sampled cohort — the
    window fill; the rest queue for round 12."""
    last = _last_sampled()
    registry.load_all()
    r3 = sorted(
        q for q, r in last.items() if r == 3 and q in registry._QUERIES
    )
    assert len(r3) == 43, f"r3-era cohort drifted: {len(r3)}"
    return r3[:R3_FILL_COUNT]


def test_no_reds_to_recheck():
    """The cumulative ledger through round 10 is fully green — no query
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
    """VERDICT r10 item #1's Done bar: every one of the 26 never-sampled
    round-10 additions sits at the FRONT of the window (override 8,
    slots 0..25)."""
    never = _never_sampled()
    assert len(never) == NEVER_SAMPLED_COUNT, f"backlog drifted: {len(never)}"
    for n in sorted(never):
        assert _priority(n) == 8, (n, _priority(n))
    head = set(_ordered()[:NEVER_SAMPLED_COUNT])
    assert head == never, (sorted(head - never), sorted(never - head))


def test_canary_tranche_follows_backlog():
    """D1/D14/D15 (last sampled round 9) take slots 26..28 at their
    permanent priority 10; the 12 r7-era canaries re-sampled green in
    round 10 pin at 100; D17/D18 ride the never-sampled backlog."""
    tranche = _legacy_canary_tranche()
    assert len(tranche) == CANARY_TRANCHE_COUNT
    names = _ordered()
    mid = names[NEVER_SAMPLED_COUNT : NEVER_SAMPLED_COUNT + CANARY_TRANCHE_COUNT]
    assert set(mid) == set(tranche), (sorted(mid), tranche)
    assert all(_priority(n) == 10 for n in mid)
    registry.load_all()
    never = _never_sampled()
    for n in registry._QUERIES:
        if not n.startswith("q_canary_"):
            continue
        if n in tranche:
            continue
        if n in never:
            assert _priority(n) == 8, (n, _priority(n))
        elif n in ROUND11_NEW_THIS_ROUND:
            assert _priority(n) == 30, (n, _priority(n))
        else:  # re-sampled green in round 10
            assert _priority(n) == 100, (n, _priority(n))


def test_freshness_tranche_fills_the_window():
    """Slots 29..45: the 17 remaining round-2-last-sampled queries
    re-enter at override 12; slots 46..49: the 4 oldest round-3 queries
    at override 14."""
    tranche = _freshness_tranche()
    names = _ordered()
    tail = names[
        NEVER_SAMPLED_COUNT
        + CANARY_TRANCHE_COUNT : NEVER_SAMPLED_COUNT
        + CANARY_TRANCHE_COUNT
        + FRESHNESS_TRANCHE_COUNT
    ]
    assert set(tail) == set(tranche), (sorted(tail), tranche)
    assert all(_priority(n) == 12 for n in tail)
    fill = names[
        NEVER_SAMPLED_COUNT
        + CANARY_TRANCHE_COUNT
        + FRESHNESS_TRANCHE_COUNT : DRIVER_WINDOW
    ]
    assert set(fill) == set(_r3_fill_tranche()), (sorted(fill),)
    assert all(_priority(n) == 14 for n in fill)


def test_window_composition_exact():
    """26 backlog + 3 canaries + 17 freshness + 4 r3-fill = the exact
    50-slot window."""
    assert (
        NEVER_SAMPLED_COUNT
        + CANARY_TRANCHE_COUNT
        + FRESHNESS_TRANCHE_COUNT
        + R3_FILL_COUNT
        == DRIVER_WINDOW
    )
    names = _ordered()
    window = set(names[:DRIVER_WINDOW])
    expect = (
        _never_sampled()
        | set(_legacy_canary_tranche())
        | set(_freshness_tranche())
        | set(_r3_fill_tranche())
    )
    assert window == expect, (
        sorted(window - expect),
        sorted(expect - window),
    )
    # round-11 additions (priority 30) queue directly after the window,
    # ahead of the pinned-100 majority
    after = names[DRIVER_WINDOW : DRIVER_WINDOW + len(ROUND11_NEW_THIS_ROUND)]
    assert set(after) == ROUND11_NEW_THIS_ROUND, after


def test_new_this_round_constant_is_exact():
    """ROUND11_NEW_THIS_ROUND == (registered queries with no driver row
    that are not part of the round-10 backlog) — the r6 lesson: update the
    constant with EVERY new @query or the recompute tests drift."""
    registry.load_all()
    unsampled = set(registry._QUERIES) - set(
        _rows_through(LAST_DRIVER_ROUND)
    )
    new = unsampled - _never_sampled()
    assert new == ROUND11_NEW_THIS_ROUND, (
        sorted(new - ROUND11_NEW_THIS_ROUND),
        sorted(ROUND11_NEW_THIS_ROUND - new),
    )
    for n in sorted(ROUND11_NEW_THIS_ROUND):
        assert n in registry._QUERIES, f"{n} listed but not registered"
        assert _priority(n) == 30, (n, _priority(n))


def test_every_ever_sampled_query_pinned_at_10_12_14_or_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of the rotation plan."""
    registry.load_all()
    fresh = set(_freshness_tranche())
    canaries = set(_legacy_canary_tranche())
    fill = set(_r3_fill_tranche())
    for n in sorted(
        set(_rows_through(LAST_DRIVER_ROUND)) & set(registry._QUERIES)
    ):
        p = _priority(n)
        if n in fresh:
            assert p == 12, f"{n}: freshness tranche must be 12, got {p}"
        elif n in canaries:
            assert p == 10, f"{n}: canary tranche must be 10, got {p}"
        elif n in fill:
            assert p == 14, f"{n}: r3-fill tranche must be 14, got {p}"
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
