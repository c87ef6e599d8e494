"""sf-scaling smoke: the quadratic-prone dedup operators must grow
sub-quadratically in data size.

The pairwise dedup family (exact Jaccard, char-n-gram Jaccard, MinHash LSH,
cluster resolution) is exactly where a naive plan is O(n²) — an all-pairs
self-join that "works on 60k rows" and dies at 100 TB. This test turns the
"survives 100×" claim into a regression: each query is timed at sf0.01 and
sf0.1 (a true 10× decade in corpus size) and the fitted log-log slope
log(t_big/t_small) / log(10) must stay below 2.0. A genuinely quadratic
candidate explosion across the decade would show slope ≈ 2 even with fixed
per-job overhead inflating the small-sf time (overhead only *lowers* the
measured slope, so a failure here is a real blow-up, not noise).

Timing uses the same noop-sink execution as bench.py: the full physical plan
runs (scan → shuffle → join → verify) without Py4Jcollect() transfer.
"""

from __future__ import annotations

import math
import os
import time

import pytest

from spark_kinesis_sql_asl_spark.registry import all_queries

_SF_SMALL = ("/root/testdata/sf0.01", 0.01)
_SF_BIG = ("/root/testdata/sf0.1", 0.1)
_MAX_SLOPE = 2.0

_QUADRATIC_PRONE = [
    "q_llm_dedup_jaccard",
    "q_llm_dedup_ngram",
    "q_llm_dedup_minhash",
    "q_llm_dedup_cluster",
    "q_llm_dedup_editdist",
    "q_llm_bitext_mine",  # label-blocked pairwise (round 3) — same risk class
    "q_llm_dedup_embed",  # label-blocked pairwise w/ auto LSH crossover (r4)
    # round 7: diagonal shingle-run pair join — sum(df^2) candidate risk,
    # df-capped; first touch per (session, sf) builds the memoized span
    # cache, so the measured time is the honest build+consume cost.
    "q_llm_substring_dup",
    # round 8: cell-blocked pairwise (SemDeDup) — sum(|cell|^2) candidate
    # risk if training collapses cells; delta-vs-corpus band probe — same
    # collision-blow-up class as minhash. First touch builds the memoized
    # trained-assignment state (honest build+consume cost, as above).
    "q_llm_dedup_semantic",
    "q_llm_ingest_neardup",
    # round 10 (VERDICT r9 #7): the round-8/9 pair consumers — leakage and
    # quality matrices ride the memoized PPJoin frame (their own joins are
    # id-keyed but the frame they cross is the pair blow-up surface), and
    # copurchase is the bipartite fan-out per shared customer (capped hot
    # keys) over the lineitem decade.
    "q_llm_split_leakage",
    "q_llm_quality_dup_matrix",
    "q_graph_copurchase",
    # round 11: cell-blocked eps self-join (sum(|cell|^2) candidate risk if
    # the density dial were wrong) + the hash-to-min CC loop; first touch
    # builds the memoized pair/label state — honest build+consume cost.
    "q_geo_dbscan",
    # round 11: pair-state consumers — tightness crosses the semantic pair
    # graph with a (cluster, dim) rollup, the overlap matrix equi-joins all
    # three memoized pair frames (the split_leakage risk class).
    "q_llm_cluster_tightness",
    "q_llm_dedup_method_overlap",
]


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    all_queries()[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


@pytest.mark.slow
@pytest.mark.parametrize("name", _QUADRATIC_PRONE)
def test_subquadratic_scaling(spark, name):
    # Warm-up at the smallest sf so JVM/codegen/parquet-footer costs are not
    # charged to the measured small-sf run (they would only lower the slope,
    # but a warmed measurement is the honest one).
    _run(spark, name, "/root/testdata/sf0.001")

    # Best-of-2 per scale: min() discards load spikes (a loaded host can
    # only inflate a single timing, pushing a legitimately linear operator
    # past the slope gate); two runs bound the added suite cost.
    t_small = min(_run(spark, name, _SF_SMALL[0]) for _ in range(2))
    t_big = min(_run(spark, name, _SF_BIG[0]) for _ in range(2))
    slope = math.log(t_big / t_small) / math.log(_SF_BIG[1] / _SF_SMALL[1])
    assert slope < _MAX_SLOPE, (
        f"{name}: log-log slope {slope:.2f} over sf0.01->sf0.1 "
        f"({t_small:.2f}s -> {t_big:.2f}s) looks quadratic"
    )


# --- Constant-dup-density decade (the sf1 proof) -----------------------------
#
# The driver fixture's 31-token vocabulary makes the tau=0.8 pair OUTPUT
# grow ~quadratically (6% of all doc pairs qualify at sf0.1), so over that
# data even a perfect plan is Theta(N^2) and the gate above leans on fixed
# overhead to stay under 2.0. This decade re-measures the documents-side
# pair families on scripts/gen_scaling_fixture.py corpora (Heaps-law vocab,
# planted clusters, ~4 true partners per doc at ANY size — pair output
# O(N)), one point at the sf0.1 size (5k docs) and one at the sf1 size
# (50k docs). Here a super-linear slope is the PLAN's fault, so the gate
# tightens to 1.5: candidate generation, not output volume, is on trial.

_GEN_ROOT = "/tmp/spark_scaling_fixture"
_GEN_SMALL = (os.path.join(_GEN_ROOT, "d5k"), 5_000)
_GEN_BIG = (os.path.join(_GEN_ROOT, "d50k"), 50_000)
_MAX_SLOPE_CONST_DENSITY = 1.5

# documents- and embeddings-side pair families (the generator writes both
# tables since round 11); jaccard FIRST: split_leakage/quality_dup_matrix
# ride its memoized scored frame, so the builder cost lands on the
# builder's own row.
_CONST_DENSITY_QUERIES = [
    "q_llm_dedup_jaccard",
    "q_llm_dedup_minhash",
    "q_llm_split_leakage",
    "q_llm_quality_dup_matrix",
    # round 11 (VERDICT r10 #3): the remaining pair-generating builders
    # with the same quadratic risk profile — asymmetric containment
    # prefix join, shingle-diagonal span join, and cell-blocked SemDeDup.
    "q_llm_dedup_containment",
    "q_llm_substring_dup",
    "q_llm_dedup_semantic",
]


@pytest.fixture(scope="module")
def gen_dirs():
    from scripts.gen_scaling_fixture import generate

    generate(*_GEN_SMALL)
    generate(*_GEN_BIG)
    return _GEN_SMALL[0], _GEN_BIG[0]


# Family BUILDERS are measured on their FIRST touch per (session, sf_dir):
# the candidate-generation build is exactly the quadratic risk, and after it
# the memo turns every later run into a checkpoint re-read (best-of-2 would
# time the memo, not the join). JVM/codegen warm-up comes from the driver
# fixture (different memo key — warms code paths, not the family state).
_CONST_DENSITY_BUILDERS = {
    "q_llm_dedup_jaccard",
    "q_llm_dedup_minhash",
    "q_llm_dedup_containment",
    "q_llm_substring_dup",
    "q_llm_dedup_semantic",
}


def _decade_conf(spark, name: str, n_docs: int):
    """Per-scale configuration for the decade run. The semantic family's
    cell count must GROW with the corpus (k ~ N/cell_target keeps cell
    SIZE bounded — the C125 docstring's 100 TB sizing; fixed k=16 makes
    the cell-blocked candidate join Θ(N²/16) by construction, i.e. the
    decade would measure the configuration, not the plan). The fixture
    writes 2·n_docs/5 embeddings, matching the sf0.1→sf1 table ratio."""
    if name == "q_llm_dedup_semantic":
        n_vecs = 2 * n_docs // 5
        spark.conf.set(
            "spark.kinesislike.semantic.cells",
            str(max(16, n_vecs // 125)),
        )


@pytest.mark.slow
@pytest.mark.parametrize("name", _CONST_DENSITY_QUERIES)
def test_constant_density_decade(spark, name, gen_dirs):
    small, big = gen_dirs
    _run(spark, name, "/root/testdata/sf0.001")  # codegen warm-up only
    try:
        times = []
        for sf_dir, n_docs in (
            (small, _GEN_SMALL[1]),
            (big, _GEN_BIG[1]),
        ):
            _decade_conf(spark, name, n_docs)
            if name in _CONST_DENSITY_BUILDERS:
                times.append(_run(spark, name, sf_dir))
            else:
                # riders: let the family build land first
                _run(spark, name, sf_dir)
                times.append(
                    min(_run(spark, name, sf_dir) for _ in range(2))
                )
        t_small, t_big = times
    finally:
        if name == "q_llm_dedup_semantic":
            spark.conf.unset("spark.kinesislike.semantic.cells")
    slope = math.log(t_big / t_small) / math.log(10.0)
    assert slope < _MAX_SLOPE_CONST_DENSITY, (
        f"{name}: constant-density slope {slope:.2f} over 5k->50k docs "
        f"({t_small:.2f}s -> {t_big:.2f}s) — candidate generation is "
        f"super-linear on O(N)-pair data"
    )
