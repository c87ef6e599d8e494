"""UDF / UDAF / UDTF surface (SURVEY.md §2 rows B71-B74).

UDFs are the slow path (per-row Python) — kept OUT of every other query's
hot path; this module exists to pin the extension surface itself. The
pandas_udf variant is the scale-sanctioned form (Arrow batches, ~10-100×
the row-at-a-time throughput); q_udf_scalar vs q_udf_pandas compute the
same expression so bench can show the gap.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType

from ..registry import query
from ..tables import table


@udf(DoubleType())
def _charge_py(price: float, discount: float, tax: float) -> float:
    # Same IEEE expression tree as the SQL oracle → bit-identical per row.
    # SQL NULL arrives as Python None; propagate it like the SQL expression
    # does instead of crashing the worker.
    if price is None or discount is None or tax is None:
        return None
    return price * (1.0 - discount) * (1.0 + tax)


@query(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q_udf_scalar(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _charge_py("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@pandas_udf(DoubleType())
def _charge_pandas(
    price: pd.Series, discount: pd.Series, tax: pd.Series
) -> pd.Series:
    return price * (1.0 - discount) * (1.0 + tax)


@query(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q_udf_pandas(spark, sf_dir):
    # Arrow-vectorized twin of q_udf_scalar (elementwise Series ops are the
    # same IEEE expression per row → still bit-identical to the oracle).
    li = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _charge_pandas("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


def _weighted_mean(pdf: pd.DataFrame) -> pd.DataFrame:
    w = pdf["l_quantity"].sum()
    v = (pdf["l_extendedprice"] * pdf["l_quantity"]).sum()
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "wavg_price": [round(v / w, 4)],
            "n_rows": [len(pdf)],
        }
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark, sf_dir):
    """B73 grouped-map UDAF via applyInPandas — each group arrives as one
    Arrow batch. Scale note: a group must fit in executor memory; group key
    cardinality 3 here, fine — for high-skew keys pre-aggregate instead."""
    li = table(spark, sf_dir, "lineitem").select(
        # project BEFORE the grouped exchange: only the 3 referenced columns
        # cross the shuffle and the Arrow boundary (16-col frame otherwise)
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        _weighted_mean,
        schema="l_returnflag string, wavg_price double, n_rows bigint",
    )


@udtf(returnType="r_name: string, i: int")
class _ExpandRegion:
    """Row-expanding UDTF: region row → (r_regionkey + 1) numbered rows."""

    def eval(self, r_name: str, r_regionkey: int):
        for i in range(r_regionkey + 1):
            yield r_name, i


@query(
    "q_udtf_expand",
    oracle="""
    SELECT r_name, CAST(unnest(range(0, r_regionkey + 1)) AS INTEGER) AS i
    FROM region
    """,
)
def q_udtf_expand(spark, sf_dir):
    table(spark, sf_dir, "region").createOrReplaceTempView("region_udtf_in")
    spark.udtf.register("expand_region", _ExpandRegion)
    return spark.sql(
        """
        SELECT e.r_name, e.i
        FROM region_udtf_in r,
             LATERAL expand_region(r.r_name, r.r_regionkey) e
        """
    )
