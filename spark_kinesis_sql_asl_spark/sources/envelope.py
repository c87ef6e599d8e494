"""Kinesis record envelope (SURVEY.md §1.1, §2 rows A6-A8).

The de-facto 5-column record schema of this connector family
(data/streamName/partitionKey/sequenceNumber/approximateArrivalTimestamp):
these helpers convert between decoded event rows and that envelope, which
is the adapter contract between our Spark-native engine and a real
Kinesis-shaped source. KPL de-aggregation (A8) lives in kpl.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINESIS_SCHEMA_DDL = (
    "data BINARY, streamName STRING, partitionKey STRING, "
    "sequenceNumber STRING, approximateArrivalTimestamp TIMESTAMP"
)


def wrap_events(events: DataFrame, stream_name: str = "events") -> DataFrame:
    """events rows → Kinesis record envelope. The payload is the raw JSON
    `props` blob (bytes), partitionKey the producer's key (user), and
    sequenceNumber the per-shard monotonic id (A6)."""
    return events.select(
        F.encode("props", "UTF-8").alias("data"),
        F.lit(stream_name).alias("streamName"),
        F.col("user_id").cast("string").alias("partitionKey"),
        F.col("event_id").cast("string").alias("sequenceNumber"),
        F.col("ts").alias("approximateArrivalTimestamp"),
    )


def decode_json_payload(records: DataFrame, field: str = "k") -> DataFrame:
    """Schema-on-read payload decode (A7): data bytes → string →
    get_json_object. Stays entirely in codegen — no Python."""
    return records.withColumn(
        f"{field}_val",
        F.get_json_object(F.col("data").cast("string"), f"$.{field}").cast("int"),
    )
