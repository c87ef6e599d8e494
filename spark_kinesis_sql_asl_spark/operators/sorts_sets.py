"""Sorts, top-k, set operations (SURVEY.md §2 rows B40-B45).

The driver's value-hash is order-insensitive, so sort order is materialized
as a row_number column (B40) or pinned by a unique composite key (B41).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal,
           row_number() OVER (ORDER BY c_acctbal DESC NULLS LAST,
                              c_mktsegment ASC NULLS LAST, c_custkey ASC) AS rn
    FROM customer
    """,
)
def q_sort_multi(spark, sf_dir):
    """Multi-key sort materialized via an exact global rank. Round-5: the
    rank comes from :func:`..operators.analytics.global_rank` (range-
    repartition on the sort key + per-range-partition row_number +
    broadcast offsets) instead of a partitionless row_number window, so
    the production plan range-partitions the sort exactly like a global
    ``orderBy`` while still materializing the order as a column the
    driver's order-insensitive hash can check. Explicit null ordering:
    Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST — pin both so
    NULL-bearing keys sort identically."""
    from .analytics import global_rank

    c = table(spark, sf_dir, "customer")
    ranked = global_rank(
        c.select("c_custkey", "c_mktsegment", "c_acctbal"),
        [
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_mktsegment").asc_nulls_last(),
            F.col("c_custkey").asc(),
        ],
        "rn",
    )
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("bal"),
        F.col("rn").cast("int").alias("rn"),
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_topk(spark, sf_dir):
    # orderBy+limit → TakeOrderedAndProject: per-partition heaps, only k rows
    # reach the driver — the same plan holds at 100 TB.
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@query(
    "q_set_union_all",
    oracle="""
    SELECT c_custkey AS id, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
    UNION ALL
    SELECT user_id AS id, 'event' AS src FROM events
    """,
)
def q_set_union_all(spark, sf_dir):
    """B42 — also the Tier A9 semantics: a multi-stream source is exactly a
    unionByName of per-stream relations (SURVEY.md §2 A9)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lit("customer").alias("src")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.lit("supplier").alias("src")
    )
    e = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("id"), F.lit("event").alias("src")
    )
    return c.unionByName(s).unionByName(e)


@query(
    "q_set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_set_union_distinct(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_set_intersect(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "q_set_except",
    oracle="""
    SELECT o_custkey AS ck FROM orders
    EXCEPT
    SELECT c_custkey AS ck FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_set_except(spark, sf_dir):
    # Right side filtered to one segment so the difference is non-empty
    # (suppliers/customers cover every nation key → trivial EXCEPTs are all
    # empty at sf0.01, verified).
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("ck"))
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("ck"))
    )
    return o.subtract(c)


# --- B76/B77: pivot / unpivot (reshaping) --------------------------------

_PIVOT_TYPES = ("click", "purchase", "view")


@query(
    "q_pivot",
    oracle=f"""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    WHERE event_type IN {_PIVOT_TYPES!r}
    GROUP BY user_id
    """,
)
def q_pivot(spark, sf_dir):
    """B76: long→wide pivot — `groupBy().pivot(col, values)` compiles to a
    single 2-phase hash aggregate (one shuffle); passing the value list
    explicitly skips the extra distinct-values job, which at 100 TB is the
    difference between one pass and two."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin(*_PIVOT_TYPES)
    )
    return (
        e.groupBy("user_id")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_PIVOT_TYPES))
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, 'price' AS metric, o_totalprice AS val
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
    FROM orders
    """,
)
def q_unpivot(spark, sf_dir):
    """B77: wide→long unpivot via `unpivot` (SQL `stack` equivalent) — a
    zero-shuffle narrow transform (each row expands partition-locally)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["price", "custkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )
