"""KPL aggregated-record de-aggregation (SURVEY.md §2 row A8).

The Kinesis Producer Library packs many logical user records into one
physical Kinesis record using a public wire format (documented in
aws/amazon-kinesis-producer's aggregation-format.md and implemented by
aws/kinesis-aggregation):

    [4-byte magic 0xF3 0x89 0x9A 0xC2]
    [protobuf AggregatedRecord]
    [16-byte md5 digest of the protobuf bytes]

    message AggregatedRecord {
      repeated string partition_key_table   = 1;
      repeated string explicit_hash_key_table = 2;
      repeated Record records               = 3;
    }
    message Record {
      required uint64 partition_key_index   = 1;
      optional uint64 explicit_hash_key_index = 2;
      required bytes  data                  = 3;
    }

The protobuf subset used is tiny (varints + length-delimited fields), so the
codec below is dependency-free pure Python. The Spark-side de-aggregation
stage is an Arrow-batched ``mapInPandas`` that explodes each aggregated
envelope row into its user records — exactly what the upstream
``kinesis-asl`` consumer does JVM-side before row conversion.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

KPL_MAGIC = b"\xf3\x89\x9a\xc2"


# --- minimal protobuf wire codec --------------------------------------------


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    # Callers expect ValueError on any corrupt blob: bound the shift (a
    # valid uint64 varint is <= 10 bytes) and map a truncated buffer's
    # IndexError to ValueError.
    shift = 0
    val = 0
    while True:
        try:
            b = buf[i]
        except IndexError:
            raise ValueError(f"truncated varint at offset {i}") from None
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 63:
            raise ValueError(f"varint overruns 64 bits at offset {i}")


def _field(number: int, wire: int) -> bytes:
    return _write_varint((number << 3) | wire)


def _len_delimited(number: int, payload: bytes) -> bytes:
    return _field(number, 2) + _write_varint(len(payload)) + payload


# --- aggregate / deaggregate --------------------------------------------------


def kpl_aggregate(records: list[tuple[str, bytes]]) -> bytes:
    """Pack (partitionKey, data) user records into one KPL aggregated blob.
    Harness-side producer twin of :func:`kpl_deaggregate` (the upstream
    KPLBasedKinesisTestUtils role)."""
    key_table: list[str] = []
    key_index: dict[str, int] = {}
    body = bytearray()
    recs = bytearray()
    for pk, data in records:
        if pk not in key_index:
            key_index[pk] = len(key_table)
            key_table.append(pk)
        rec = (
            _field(1, 0)
            + _write_varint(key_index[pk])
            + _len_delimited(3, bytes(data))
        )
        recs += _len_delimited(3, rec)
    for pk in key_table:
        body += _len_delimited(1, pk.encode("utf-8"))
    body += recs
    payload = bytes(body)
    return KPL_MAGIC + payload + hashlib.md5(payload).digest()


def is_kpl_aggregated(blob: bytes) -> bool:
    return len(blob) >= 20 and blob[:4] == KPL_MAGIC


def kpl_deaggregate(blob: bytes) -> list[tuple[str, bytes]]:
    """Unpack a KPL aggregated blob into (partitionKey, data) user records.
    Raises ValueError on a bad magic prefix or md5 checksum (corrupt blob);
    callers treat non-magic blobs as plain (non-aggregated) records."""
    if not is_kpl_aggregated(blob):
        raise ValueError("not a KPL aggregated record")
    payload, digest = blob[4:-16], blob[-16:]
    if hashlib.md5(payload).digest() != digest:
        raise ValueError("KPL aggregated record failed md5 check")
    key_table: list[str] = []
    raw_records: list[bytes] = []
    i = 0
    while i < len(payload):
        tag, i = _read_varint(payload, i)
        number, wire = tag >> 3, tag & 0x7
        if wire == 2:
            ln, i = _read_varint(payload, i)
            chunk = payload[i : i + ln]
            i += ln
            if number == 1:
                key_table.append(chunk.decode("utf-8"))
            elif number == 3:
                raw_records.append(chunk)
        elif wire == 0:
            _, i = _read_varint(payload, i)
        else:  # pragma: no cover - format never emits other wire types
            raise ValueError(f"unsupported wire type {wire}")
    out: list[tuple[str, bytes]] = []
    for rec in raw_records:
        i = 0
        pk_idx = 0
        data = b""
        while i < len(rec):
            tag, i = _read_varint(rec, i)
            number, wire = tag >> 3, tag & 0x7
            if wire == 0:
                val, i = _read_varint(rec, i)
                if number == 1:
                    pk_idx = val
            elif wire == 2:
                ln, i = _read_varint(rec, i)
                if number == 3:
                    data = rec[i : i + ln]
                i += ln
        out.append((key_table[pk_idx], data))
    return out


# --- Spark stage --------------------------------------------------------------


def deaggregate_records(records):
    """A8 as a Spark stage: envelope rows (KINESIS_SCHEMA_DDL) whose ``data``
    may be KPL-aggregated → one row per user record. Aggregated rows explode
    (partitionKey taken from the KPL key table, sub-sequence index appended
    to sequenceNumber, timestamp inherited); plain rows pass through.
    Arrow-batched, partition-local — no shuffle, same as the JVM-side
    de-aggregation in the upstream consumer."""
    import pandas as pd

    out_ddl = (
        "data BINARY, streamName STRING, partitionKey STRING, "
        "sequenceNumber STRING, approximateArrivalTimestamp TIMESTAMP"
    )

    def explode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("data", "streamName", "partitionKey", "sequenceNumber",
                     "approximateArrivalTimestamp")}
            for _, r in pdf.iterrows():
                blob = bytes(r["data"])
                if is_kpl_aggregated(blob):
                    for sub, (pk, data) in enumerate(kpl_deaggregate(blob)):
                        rows["data"].append(data)
                        rows["streamName"].append(r["streamName"])
                        rows["partitionKey"].append(pk)
                        rows["sequenceNumber"].append(
                            f"{r['sequenceNumber']}.{sub}"
                        )
                        rows["approximateArrivalTimestamp"].append(
                            r["approximateArrivalTimestamp"]
                        )
                else:
                    for k in rows:
                        rows[k].append(r[k] if k != "data" else blob)
            yield pd.DataFrame(rows)

    return records.mapInPandas(explode, schema=out_ddl)
