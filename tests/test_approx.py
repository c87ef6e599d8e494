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
    exact = {
        r.l_returnflag: (r.p50, r.p95)
        for r in table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    # GK with accuracy=1000 guarantees rank error <= 1/1000; translate to a
    # loose value tolerance via the local value spread
    for k, (e50, e95) in exact.items():
        a50, a95 = got[k]
        assert abs(a50 - e50) / e50 < 0.02, (k, a50, e50)
        assert abs(a95 - e95) / e95 < 0.02, (k, a95, e95)
