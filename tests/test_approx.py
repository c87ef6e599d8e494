"""Error-bound harness for the approximate aggregates (rows-only queries
B29/B29b): a sketch has no cross-engine oracle, so its contract is a
quantitative bound against the exact computation — the same pattern the
LLM approximations use (tests/test_llm.py recall bounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_kinesis_sql_asl_spark.registry import all_queries
from spark_kinesis_sql_asl_spark.tables import table

from .conftest import SF_ORACLE


def test_approx_distinct_within_declared_rsd(spark):
    approx = {
        r.l_returnflag: r.approx_parts
        for r in all_queries()["q_agg_approx_distinct"](spark, SF_ORACLE).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        # declared rsd=0.02; allow 4 sigma
        assert abs(approx[k] - exact[k]) / exact[k] < 0.08, (
            k,
            approx[k],
            exact[k],
        )


def test_approx_percentile_within_rank_error(spark):
    got = {
        r.l_returnflag: (r.p50, r.p95)
        for r in all_queries()["q_agg_percentile_approx"](spark, SF_ORACLE).collect()
    }
    # GK with accuracy=1000 guarantees RANK error <= 1/1000 — it implies
    # nothing about relative VALUE error (on a heavy tail a rank-correct
    # answer can be far away in value), so bound by rank: the approximate
    # value must fall between the exact order statistics at ranks
    # n*(q ± eps). Collecting per-group values is fine at sf0.01 (~60k).
    eps = 1.0 / 1000.0
    by_group: dict[str, list[float]] = {}
    for r in (
        table(spark, SF_ORACLE, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        by_group.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for k, vals in by_group.items():
        vals.sort()
        n = len(vals)
        for q, approx in zip((0.5, 0.95), got[k]):
            lo = vals[max(0, int(n * (q - eps)) - 1)]
            hi = vals[min(n - 1, int(n * (q + eps)))]
            assert lo <= approx <= hi, (k, q, approx, lo, hi)
