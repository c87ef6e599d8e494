"""Property-based spot checks (SURVEY.md §5.2.4): relational laws verified
against pure-Python references on hypothesis-generated frames — cheap
insurance for the cases the fixtures don't cover (NULL keys, duplicate keys,
empty sides). Kept small: a handful of examples per law, one shared session.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

KEYS = st.one_of(st.none(), st.integers(min_value=0, max_value=4))
VALS = st.integers(min_value=-100, max_value=100)
ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, schema="k int, v int")


@given(a=ROWS, b=ROWS)
@_SETTINGS
def test_union_all_counts_add(spark, a, b):
    assert _df(spark, a).unionByName(_df(spark, b)).count() == len(a) + len(b)


@given(a=ROWS, b=ROWS)
@_SETTINGS
def test_inner_join_cardinality_null_keys_drop(spark, a, b):
    # inner equi-join: |{(x,y): x.k == y.k}| with NULL keys never matching
    ca = Counter(k for k, _ in a if k is not None)
    cb = Counter(k for k, _ in b if k is not None)
    expect = sum(ca[k] * cb[k] for k in ca)
    got = (
        _df(spark, a)
        .alias("a")
        .join(_df(spark, b).alias("b"), F.col("a.k") == F.col("b.k"))
        .count()
    )
    assert got == expect


@given(a=ROWS, b=ROWS)
@_SETTINGS
def test_left_join_preserves_unmatched(spark, a, b):
    ca = Counter(k for k, _ in a if k is not None)
    cb = Counter(k for k, _ in b if k is not None)
    matched = sum(ca[k] * cb[k] for k in ca)
    unmatched = sum(1 for k, _ in a if k is None or cb[k] == 0)
    got = (
        _df(spark, a)
        .alias("a")
        .join(_df(spark, b).alias("b"), F.col("a.k") == F.col("b.k"), "left")
        .count()
    )
    assert got == matched + unmatched


@given(a=ROWS)
@_SETTINGS
def test_groupby_sums_refold_to_global(spark, a):
    per_key = (
        _df(spark, a).groupBy("k").agg(F.sum("v").alias("s")).collect()
    )
    total = sum(r.s for r in per_key if r.s is not None)
    assert total == sum(v for _, v in a)
    # NULL forms its own group
    assert len(per_key) == len({k for k, _ in a})


@given(a=ROWS, b=ROWS)
@_SETTINGS
def test_except_all_bag_semantics(spark, a, b):
    # exceptAll = multiset difference (NULL-safe equality on whole rows)
    expect = Counter(a) - Counter(b)
    got = Counter(
        (r.k, r.v) for r in _df(spark, a).exceptAll(_df(spark, b)).collect()
    )
    assert got == expect


@given(a=ROWS)
@_SETTINGS
def test_null_safe_equality_vs_standard(spark, a):
    df = _df(spark, a)
    n_null = sum(1 for k, _ in a if k is None)
    # standard = never matches NULL; <=> treats NULL as a value
    assert df.where(F.col("k").eqNullSafe(F.lit(None).cast("int"))).count() == n_null
    assert df.where(F.col("k") == F.lit(None).cast("int")).count() == 0


@given(a=ROWS)
@_SETTINGS
def test_dropduplicates_is_distinct_key_set(spark, a):
    got = _df(spark, a).dropDuplicates(["k", "v"]).count()
    assert got == len(set(a))
