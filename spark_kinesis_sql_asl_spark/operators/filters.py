"""Projection / filter / predicate surface (SURVEY.md §2 rows B5-B8).

Per-row arithmetic is left unrounded: a fixed expression tree over doubles is
IEEE-deterministic and bit-identical across engines; only aggregates need
rounding discipline (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "q_project_arith",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def q_project_arith(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("revenue"),
        (
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("charge"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
    FROM lineitem
    WHERE (l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R'))
       OR (NOT (l_linestatus = 'O') AND l_discount > 0.08)
    """,
)
def q_filter_compound(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    cond = (
        F.col("l_quantity").between(10, 20) & F.col("l_returnflag").isin("A", "R")
    ) | (~(F.col("l_linestatus") == "O") & (F.col("l_discount") > 0.08))
    return li.where(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_linestatus",
    )


@query(
    "q_filter_null",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'F') AS st_or_null,
           coalesce(nullif(o_orderstatus, 'F'), 'FALLBACK') AS st_filled,
           (nullif(o_orderstatus, 'F') IS NOT DISTINCT FROM 'O') AS is_o,
           (nullif(o_orderstatus, 'F') IS NULL) AS is_null
    FROM orders
    WHERE nullif(o_orderstatus, 'P') IS NOT NULL
    """,
)
def q_filter_null(spark, sf_dir):
    # Fixtures contain no NULLs (FIXTURES.md) — synthesize them with nullif,
    # then exercise coalesce / null-safe equality / IS NULL.
    o = table(spark, sf_dir, "orders")
    st_or_null = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return (
        o.where(F.nullif(F.col("o_orderstatus"), F.lit("P")).isNotNull())
        .select(
            "o_orderkey",
            st_or_null.alias("st_or_null"),
            F.coalesce(st_or_null, F.lit("FALLBACK")).alias("st_filled"),
            st_or_null.eqNullSafe(F.lit("O")).alias("is_o"),
            st_or_null.isNull().alias("is_null"),
        )
    )


@query(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_name LIKE '%a%'
      AND (p_type LIKE 'PROMO%' OR p_brand LIKE '%1%')
    """,
)
def q_filter_like(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").like("%a%")
        & (F.col("p_type").startswith("PROMO") | F.col("p_brand").contains("1"))
    ).select("p_partkey", "p_name", "p_brand", "p_type")
