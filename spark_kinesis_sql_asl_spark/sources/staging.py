"""Staging writer: events → sharded chunk files for the kinesislike source
(SURVEY.md §5.2.3 replay harness).

Mimics the producer side of Kinesis: records are routed to shards by a hash
of partitionKey (like the service's MD5 ring), ordered by arrival time
within a shard, and assigned monotonically increasing per-shard sequence
numbers. Pure pyarrow — callable without a SparkSession.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

_ENVELOPE_FIELDS = [
    ("data", pa.binary()),
    ("streamName", pa.string()),
    ("partitionKey", pa.string()),
    ("sequenceNumber", pa.string()),
    ("approximateArrivalTimestamp", pa.timestamp("us")),
]


def _route(partition_key: str, n_shards: int) -> int:
    h = hashlib.md5(partition_key.encode("utf-8")).hexdigest()
    return int(h, 16) % n_shards


def write_staging(
    events: list[dict],
    root: str,
    stream: str = "events",
    n_shards: int = 3,
    n_chunks: int = 4,
    start_chunk: int = 0,
    seq_start: int = 0,
) -> int:
    """Write event dicts (keys: ts, user_id, props/payload …) as envelope
    chunks. Returns the number of records written.

    `start_chunk`/`seq_start` let tests append later "arrivals" to an
    existing staging dir (restart/recovery scenarios, A3/B70).
    """
    shards: list[list[dict]] = [[] for _ in range(n_shards)]
    for ev in events:
        pk = str(ev["user_id"])
        payload = ev.get("payload")
        if payload is None:
            payload = ev.get("props", "{}")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        shards[_route(pk, n_shards)].append(
            {
                "data": payload,
                "streamName": stream,
                "partitionKey": pk,
                "approximateArrivalTimestamp": ev["ts"],
            }
        )

    n = 0
    for k, recs in enumerate(shards):
        recs.sort(key=lambda r: (r["approximateArrivalTimestamp"], r["partitionKey"]))
        for i, r in enumerate(recs):
            # per-shard monotonically increasing sequence numbers (A6),
            # zero-padded so lexicographic order == numeric order
            r["sequenceNumber"] = f"{seq_start + i:020d}"
        shard_dir = os.path.join(root, stream, f"shard-{k}")
        os.makedirs(shard_dir, exist_ok=True)
        per = max(1, (len(recs) + n_chunks - 1) // n_chunks) if recs else 1
        for c in range(n_chunks):
            chunk = recs[c * per : (c + 1) * per]
            arrays = {
                name: pa.array([r.get(name) for r in chunk], type=typ)
                for name, typ in _ENVELOPE_FIELDS
            }
            tbl = pa.table(arrays)
            pq.write_table(
                tbl, os.path.join(shard_dir, f"{start_chunk + c:08d}.parquet")
            )
            n += len(chunk)
    return n


def events_to_dicts(rows) -> list[dict]:
    """Spark Row list (events schema) → staging dicts with a JSON payload
    carrying the full event (so consumers can decode it back, A7)."""
    out = []
    for r in rows:
        out.append(
            {
                "user_id": r.user_id,
                "ts": r.ts,
                "payload": json.dumps(
                    {
                        "event_id": r.event_id,
                        "event_type": r.event_type,
                        "k": json.loads(r.props).get("k"),
                    },
                    sort_keys=True,
                ),
            }
        )
    return out
