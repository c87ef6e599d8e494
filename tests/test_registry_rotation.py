"""Round-6 rotation window assertions (VERDICT r5 item #6).

The driver samples roughly the first 50 entries of the priority-ordered
registry for CORRECTNESS_r{N}.json. Rounds 4-5 proved that a query can sit
"local-oracle green" for multiple rounds without ever receiving the hard
driver signal, and that the rotation must be *recomputed* (not guessed)
each round. These tests pin the round-6 window composition so a priority
tie, a decorator edit, or an over-enthusiastic batch of new p30 queries
can never silently push one of the 20 never-driver-sampled queries out of
the window.

If you add new queries this round: decorator ``priority=30`` keeps them
inside the window *after* the 20 promotions; the budget test below fails
the moment the low-priority population exceeds the 50-slot window.
"""

from __future__ import annotations

import json
import os

import pytest

from spark_kinesis_sql_asl_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The 20 queries that had never received a driver CORRECTNESS row after
# round 5 (computed from CORRECTNESS_r01..r05.json: 222 distinct sampled
# names vs 242 registered). 19 are the priority-35 round-5 tail; the 20th
# is q_agg_weighted_median (decorator p30, added round 5 but never
# sampled) — named explicitly per VERDICT r5 "What's wrong" #3.
ROUND6_PROMOTIONS = frozenset(
    {
        "q_agg_skew_kurtosis",
        "q_agg_weighted_median",
        "q_agg_winsorized_mean",
        "q_events_chisq_shift",
        "q_events_conversion_rate",
        "q_events_hourly_profile",
        "q_events_markov_stationary",
        "q_fn_variant",
        "q_join_asof_nearest",
        "q_join_asof_tolerance",
        "q_llm_char_entropy",
        "q_llm_hapax_rate",
        "q_llm_knn_label_vote",
        "q_llm_langid_confusion",
        "q_llm_media_dedup",
        "q_llm_rake_keywords",
        "q_llm_submodular_coverage",
        "q_llm_zipf_fit",
        "q_privacy_tcloseness",
        "q_win_nth_value",
    }
)

DRIVER_WINDOW = 50


def _ordered():
    registry.load_all()
    return registry._ordered_names()


def _priority(name: str) -> int:
    return registry._PRIORITY[name][0]


def test_promotion_set_matches_correctness_history():
    """The promotion list IS the never-sampled set — recomputed, not copied.

    Recomputes (registered queries) - (union of CORRECTNESS_r01..r05 keys)
    from the committed artifacts and asserts it equals ROUND6_PROMOTIONS,
    so the hand-maintained constant above can never drift from history.
    """
    registry.load_all()
    sampled: set[str] = set()
    for r in range(1, 6):
        path = os.path.join(REPO, f"CORRECTNESS_r0{r}.json")
        if not os.path.exists(path):  # pragma: no cover - driver artifact
            pytest.skip(f"missing {path}")
        with open(path) as f:
            sampled |= set(json.load(f))
    never = set(registry._QUERIES) - sampled - ROUND6_NEW_THIS_ROUND
    assert never == ROUND6_PROMOTIONS


def test_canaries_occupy_the_first_twelve_slots():
    names = _ordered()
    head = names[:12]
    assert all(n.startswith("q_canary_") for n in head), head
    assert all(_priority(n) == 10 for n in head)


def test_all_twenty_promotions_inside_the_driver_window():
    names = _ordered()
    window = set(names[:DRIVER_WINDOW])
    missing = ROUND6_PROMOTIONS - window
    assert not missing, f"promotions pushed out of the window: {sorted(missing)}"
    # and they sit at override 20, immediately after the canaries
    assert all(_priority(n) == 20 for n in ROUND6_PROMOTIONS)
    assert set(names[12:32]) == ROUND6_PROMOTIONS


def test_window_budget_not_overflowed_by_new_queries():
    """Every entry with priority <=30 must fit in the 50-slot window.

    12 canaries + 20 promotions = 32 reserved slots; at most 18 new p30
    queries fit. Registering a 19th would push something out silently —
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


def test_every_ever_green_query_pinned_at_100():
    """A <100 decorator priority must never leak a driver-green query back
    into the window at the expense of a never-sampled one."""
    sampled: set[str] = set()
    for r in range(1, 6):
        path = os.path.join(REPO, f"CORRECTNESS_r0{r}.json")
        with open(path) as f:
            sampled |= set(json.load(f))
    registry.load_all()
    for n in sorted(sampled & set(registry._QUERIES)):
        p = _priority(n)
        assert p in (10, 100), f"{n}: ever-sampled but priority {p}"


# Queries first registered in round 6 (decorator priority=30): they have no
# CORRECTNESS row yet by construction, so the never-sampled recomputation
# excludes them. Keep this in sync as round-6 operators land.
ROUND6_NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_llm_dedup_containment_lsh",
        "q_llm_media_phash",
        "q_llm_pq_adc_topk",
        "q_llm_psi_drift",
        "q_llm_gopher_rules",
        "q_llm_pad_waste",
        "q_llm_dup_degree",
        "q_llm_dup_span_ratio",
        "q_llm_quality_auc",
        "q_llm_dsir_weight",
    }
)
