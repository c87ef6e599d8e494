"""Round-9 rotation window assertions (VERDICT r8 item #1).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-8 proved the rotation must be
*recomputed* (not guessed) each round from the committed CORRECTNESS
artifacts. Round 8 registered 49 new queries against a 50-row window, so 41
registered queries carry no driver row yet — the round-9 window drains that
backlog completely:

  slots 0..7      the 8 remaining round-1-last-sampled queries (windows +
                  topk/unpivot) deferred from the r8 freshness rotation
                  (override 5)
  slots 8..48     the 41 never-driver-sampled r8 additions, incl. canaries
                  D14/D15 (override 8)
  slot  49        first legacy canary by registration order — the 13
                  legacy canaries return to their permanent priority 10
                  (r8 pinned them at 100 for one round); the other 12
                  queue directly after the window, first for round 10

New round-9 queries use decorator ``priority=30``: behind the canaries,
ahead of every pinned-100 query — they take their first driver rows in
round 10. Add their names to ROUND9_NEW_THIS_ROUND below; the recompute
tests fail loudly on drift.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAST_DRIVER_ROUND = 8
DRIVER_WINDOW = 50

# Queries first registered in round 9 (decorator priority=30): they have no
# CORRECTNESS row yet by construction. Keep in sync as operators land.
ROUND9_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        # B167-B170
        "q_events_lift_matrix",
        "q_events_path_prefix",
        "q_ts_seasonal_outliers",
        "q_agg_grouping_id",
        # C148-C155 (llm/training.py)
        "q_llm_probe_curve",
        "q_llm_js_divergence",
        "q_llm_compress_proxy",
        "q_llm_contrastive_pairs",
        "q_llm_curriculum_bins",
        "q_llm_cluster_reweight",
        "q_llm_dup_two_hop",
        "q_llm_ingest_cdc",
        # D16
        "q_canary_unicode_case",
        # second wave: C156/C157, B171/B172 (B163s is harness-only)
        "q_llm_split_leakage",
        "q_llm_quality_dup_matrix",
        "q_graph_copurchase",
        "q_win_order_concurrency",
        # A14
        "q_kinesis_throughput_audit",
    }
)

# The 8 round-1-last-sampled queries deferred from the r8 rotation: the
# final freshness-retirement tranche (recomputed in _r1_deferred below).
R1_DEFERRED_COUNT = 8


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


def _r1_deferred() -> list[str]:
    """The 8 queries whose latest driver row is still ROUND 1 — the tail
    of the 50-query freshness retirement started in round 8."""
    last = _last_sampled()
    return sorted(q for q, r in last.items() if r == 1)


def _never_sampled() -> set[str]:
    registry.load_all()
    return (
        set(registry._QUERIES)
        - set(_rows_through(LAST_DRIVER_ROUND))
        - ROUND9_NEW_THIS_ROUND
    )


def test_no_reds_to_recheck():
    """The cumulative ledger through round 8 is fully green — no query
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


def test_r1_deferred_tranche_heads_the_window():
    deferred = _r1_deferred()
    assert len(deferred) == R1_DEFERRED_COUNT
    names = _ordered()
    head = names[:R1_DEFERRED_COUNT]
    assert set(head) == set(deferred), (sorted(head), deferred)
    assert all(_priority(n) == 5 for n in head)


def test_never_sampled_backlog_fills_the_window():
    """VERDICT r8 item #1's Done bar: every one of the 41 never-sampled
    queries sits inside the 50-slot window (override 8, slots 8..48)."""
    never = _never_sampled()
    assert len(never) == 41, f"backlog drifted: {len(never)}"
    for n in sorted(never):
        assert _priority(n) == 8, (n, _priority(n))
    window = set(_ordered()[:DRIVER_WINDOW])
    missing = never - window
    assert not missing, f"never-sampled outside window: {sorted(missing)}"


def test_canaries_back_at_permanent_priority():
    """The 13 legacy canaries revert from the r8 one-round pin (100) to
    their permanent priority 10; D14/D15 ride the never-sampled tranche."""
    registry.load_all()
    canaries = [n for n in registry._QUERIES if n.startswith("q_canary_")]
    new_this_round = {n for n in canaries if n in ROUND9_NEW_THIS_ROUND}
    for n in canaries:
        if n in ("q_canary_ln_quant", "q_canary_wideint_convert"):
            want = 8
        elif n in new_this_round:
            want = 30
        else:
            want = 10
        assert _priority(n) == want, (n, _priority(n), want)


def test_window_composition_exact():
    """8 deferred + 41 backlog + 1 canary = the exact 50-slot window."""
    names = _ordered()
    window = names[:DRIVER_WINDOW]
    expect = set(_r1_deferred()) | _never_sampled()
    assert len(expect) == 49
    extra = [n for n in window if n not in expect]
    assert len(extra) == 1 and extra[0].startswith("q_canary_"), extra
    # the twelve remaining legacy canaries queue directly after the window
    tail = names[DRIVER_WINDOW : DRIVER_WINDOW + 12]
    assert all(n.startswith("q_canary_") for n in tail), tail


def test_new_this_round_constant_is_exact():
    """ROUND9_NEW_THIS_ROUND == (registered queries with no driver row
    that were not part of the r8 backlog) — the r6 lesson: update the
    constant with EVERY new @query or the recompute tests drift."""
    registry.load_all()
    unsampled = set(registry._QUERIES) - set(
        _rows_through(LAST_DRIVER_ROUND)
    )
    new = unsampled - _never_sampled()
    assert new == ROUND9_NEW_THIS_ROUND, (
        sorted(new - ROUND9_NEW_THIS_ROUND),
        sorted(ROUND9_NEW_THIS_ROUND - new),
    )
    for n in sorted(ROUND9_NEW_THIS_ROUND):
        assert n in registry._QUERIES, f"{n} listed but not registered"
        assert _priority(n) == 30, (n, _priority(n))


def test_every_ever_sampled_query_pinned_at_5_10_or_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of the rotation plan."""
    registry.load_all()
    deferred = set(_r1_deferred())
    for n in sorted(
        set(_rows_through(LAST_DRIVER_ROUND)) & set(registry._QUERIES)
    ):
        p = _priority(n)
        if n in deferred:
            assert p == 5, f"{n}: deferred tranche must be 5, got {p}"
        elif n.startswith("q_canary_"):
            assert p == 10, f"{n}: canary must be 10, got {p}"
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
