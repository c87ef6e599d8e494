"""The lazy-DataFrame memo in tables.py (round 14, guide §1.2).

`table()` / `parallel_table()` memoize the UNEXECUTED plan per
(session, path, file mtime+size). The contract under test: repeat calls
reuse the plan (no repeated footer/schema work), a rewritten fixture file
invalidates the entry (tests stage fixtures in-place), and nothing about
the returned frame's schema or rows changes versus a fresh read.
"""

import time

import pyarrow as pa
import pyarrow.parquet as pq

from spark_kinesis_sql_asl_spark import tables

SF = "/root/testdata/sf0.01"


def test_repeat_call_returns_memoized_plan(spark):
    a = tables.table(spark, SF, "nation")
    b = tables.table(spark, SF, "nation")
    assert a is b  # same lazy plan object — no re-read of footers


def test_parallel_table_memoized_per_key(spark):
    a = tables.parallel_table(spark, SF, "documents")
    b = tables.parallel_table(spark, SF, "documents")
    c = tables.parallel_table(spark, SF, "documents", key="text")
    assert a is b
    assert c is not a  # key participates in the memo key


def test_rewrite_invalidates(spark, tmp_path):
    d = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64())}),
        f"{d}/documents.parquet",
    )
    v1 = tables.table(spark, d, "documents")
    assert v1.columns == ["doc_id"] and v1.count() == 2
    time.sleep(0.01)  # ensure a distinct mtime_ns
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a", "b", "c"]),
            }
        ),
        f"{d}/documents.parquet",
    )
    v2 = tables.table(spark, d, "documents")
    assert v2.columns == ["doc_id", "text"] and v2.count() == 3


def test_memo_is_plan_only_not_data(spark):
    # The memoized object is a lazy plan: no persisted storage level, so
    # every action recomputes from the parquet input (no result caching).
    df = tables.table(spark, SF, "region")
    assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
