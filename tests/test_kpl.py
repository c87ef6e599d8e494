"""KPL aggregated-record de-aggregation (SURVEY.md §2 row A8): wire-format
roundtrip plus the Spark mapInPandas explode stage, mirroring the upstream
``KPLBasedKinesisTestUtils`` producer/consumer pair — fully offline.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_kinesis_sql_asl_spark.sources.envelope import wrap_events
from spark_kinesis_sql_asl_spark.sources.kpl import (
    KPL_MAGIC,
    deaggregate_records,
    is_kpl_aggregated,
    kpl_aggregate,
    kpl_deaggregate,
)
from spark_kinesis_sql_asl_spark.tables import table

from .conftest import SF_SMOKE


@given(
    st.lists(
        st.tuples(st.text(min_size=1, max_size=20), st.binary(max_size=64)),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_kpl_roundtrip(records):
    blob = kpl_aggregate(records)
    assert blob[:4] == KPL_MAGIC
    assert is_kpl_aggregated(blob)
    assert kpl_deaggregate(blob) == records


def test_kpl_checksum_rejects_corruption():
    blob = bytearray(kpl_aggregate([("pk", b"payload")]))
    blob[10] ^= 0xFF
    with pytest.raises(ValueError):
        kpl_deaggregate(bytes(blob))


def test_kpl_not_aggregated_rejected():
    with pytest.raises(ValueError):
        kpl_deaggregate(b"plain-old-record")


def test_spark_deaggregate_stage(spark):
    events = table(spark, SF_SMOKE, "events").orderBy("event_id").limit(20)
    rows = wrap_events(events).collect()

    # Producer twin: pack all user records into ONE aggregated envelope row
    # (keeping the first row's stream/sequence/timestamp as the carrier).
    packed = kpl_aggregate(
        [(r.partitionKey, bytes(r.data)) for r in rows]
    )
    carrier = rows[0]
    plain = rows[1]
    agg_df = spark.createDataFrame(
        [
            (packed, carrier.streamName, "ignored", carrier.sequenceNumber,
             carrier.approximateArrivalTimestamp),
            (bytes(plain.data), plain.streamName, plain.partitionKey,
             plain.sequenceNumber, plain.approximateArrivalTimestamp),
        ],
        schema=(
            "data binary, streamName string, partitionKey string, "
            "sequenceNumber string, approximateArrivalTimestamp timestamp"
        ),
    )
    out = deaggregate_records(agg_df).collect()
    # 20 user records from the aggregate + 1 passthrough.
    assert len(out) == 21
    exploded = [r for r in out if "." in r.sequenceNumber]
    assert len(exploded) == 20
    assert [(r.partitionKey, bytes(r.data)) for r in
            sorted(exploded, key=lambda r: int(r.sequenceNumber.split(".")[1]))] == [
        (r.partitionKey, bytes(r.data)) for r in rows
    ]
    passthrough = [r for r in out if "." not in r.sequenceNumber]
    assert len(passthrough) == 1
    assert bytes(passthrough[0].data) == bytes(plain.data)
    # partition-local: no shuffle introduced
    assert deaggregate_records(agg_df.repartition(3)).rdd.getNumPartitions() == 3


def test_varint_truncated_and_overlong_raise_value_error():
    from spark_kinesis_sql_asl_spark.sources.kpl import _read_varint

    # Truncated: continuation bit set but the buffer ends.
    with pytest.raises(ValueError, match="truncated varint"):
        _read_varint(b"\x80\x80", 0)
    # Overlong: >10 continuation bytes would shift past 64 bits.
    with pytest.raises(ValueError, match="64 bits"):
        _read_varint(b"\x80" * 11 + b"\x01", 0)
    # Sane varint still decodes.
    assert _read_varint(b"\xac\x02", 0) == (300, 2)
