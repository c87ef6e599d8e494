"""Live-AWS Kinesis integration suite — env-gated (SURVEY.md §5.1).

The upstream connector's integration tests follow the ``testIfEnabled``
pattern: they exist in the tree, compile always, and RUN only when the
operator exports the enabling variable, because CI containers have no AWS
credentials or endpoint. Same here:

    ENABLE_KINESIS_TESTS=1 \
    KINESIS_TEST_STREAM=<existing stream> \
    [AWS_REGION=...] [KINESIS_ENDPOINT_URL=http://localhost:4566] \
    python -m pytest tests/test_kinesis_live.py -q

Without ``ENABLE_KINESIS_TESTS=1`` every test SKIPS (this container: no
boto3, no network — verified to import cleanly and skip). With it, the
suite drives the REAL write path: envelope rows → ``writeStream.
foreachBatch(kinesis_put_records_writer(...))`` → boto3 ``get_records``
readback, closing the loop the offline parquet-twin tests
(tests/test_streaming.py) can only simulate. ``KINESIS_ENDPOINT_URL``
points the same suite at a local emulator (e.g. a LocalStack endpoint) —
the standard way to exercise the AWS wire protocol without an account.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from .conftest import SF_SMOKE

_ENABLED = os.environ.get("ENABLE_KINESIS_TESTS") == "1"

pytestmark = pytest.mark.skipif(
    not _ENABLED, reason="live-AWS suite; export ENABLE_KINESIS_TESTS=1 to run"
)

if _ENABLED:  # pragma: no cover - never taken in the offline container
    boto3 = pytest.importorskip("boto3")


def _client():  # pragma: no cover - live only
    return boto3.client(
        "kinesis",
        region_name=os.environ.get("AWS_REGION", "us-east-1"),
        endpoint_url=os.environ.get("KINESIS_ENDPOINT_URL") or None,
    )


def _stream_name() -> str:  # pragma: no cover - live only
    name = os.environ.get("KINESIS_TEST_STREAM")
    if not name:
        pytest.skip("KINESIS_TEST_STREAM not set")
    return name


def _drain(client, stream: str, timeout_s: float = 30.0):  # pragma: no cover
    """Read every record currently in the stream (all shards, TRIM_HORIZON)."""
    out = []
    shards = client.list_shards(StreamName=stream)["Shards"]
    deadline = time.time() + timeout_s
    for sh in shards:
        it = client.get_shard_iterator(
            StreamName=stream,
            ShardId=sh["ShardId"],
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
        while it and time.time() < deadline:
            resp = client.get_records(ShardIterator=it, Limit=1000)
            out.extend(resp["Records"])
            if resp.get("MillisBehindLatest", 0) == 0:
                break
            it = resp.get("NextShardIterator")
    return out


def test_put_records_sink_roundtrip(spark, tmp_path):  # pragma: no cover
    """events → envelope → foreachBatch put_records → get_records readback."""
    from spark_kinesis_sql_asl_spark.sources.envelope import wrap_events
    from spark_kinesis_sql_asl_spark.sources.sink import (
        kinesis_put_records_writer,
    )
    from spark_kinesis_sql_asl_spark.tables import table

    client = _client()
    stream = _stream_name()

    src = table(spark, SF_SMOKE, "events").limit(200)
    envelope = wrap_events(src, stream_name=stream)
    sent = {
        json.loads(bytes(r.data))["event_id"]
        for r in envelope.select("data").collect()
    }

    # Micro-batch the envelope through the REAL sink: a one-shot
    # availableNow stream over a staged parquet copy of the envelope.
    staged = str(tmp_path / "staged")
    envelope.write.parquet(staged)
    q = (
        spark.readStream.schema(spark.read.parquet(staged).schema)
        .parquet(staged)
        .writeStream.foreachBatch(
            kinesis_put_records_writer(
                stream,
                region=os.environ.get("AWS_REGION", "us-east-1"),
                endpoint_url=os.environ.get("KINESIS_ENDPOINT_URL") or None,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        json.loads(bytes(rec["Data"]))["event_id"]
        for rec in _drain(client, stream)
    }
    missing = sent - got
    assert not missing, f"{len(missing)} records never arrived: {sorted(missing)[:5]}"


def test_put_records_chunks_to_service_limit():  # pragma: no cover
    """>500 rows must split into multiple PutRecords calls (service limit)."""
    from spark_kinesis_sql_asl_spark.sources import sink as sink_mod

    assert sink_mod._PUT_RECORDS_MAX == 500
