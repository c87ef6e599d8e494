"""Multimodal column operators (SURVEY.md §2 row C11 + north-star
multimodal plumbing).

Design: media rides as an opaque BINARY column inside a typed struct with
metadata and an embedding — decode/feature-extraction are Arrow-batched
mapInPandas stages (stubbed deterministically here: the container has no
image/audio codecs — SURVEY.md §1.3). The Spark-side plumbing (schema,
batching, partition behavior) is real and tested in tests/test_multimodal.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table
from .similarity import as_double, sq_norm

# Typed multimodal record: the engine's answer to "image/audio/video column".
MULTIMODAL_SCHEMA_DDL = (
    "doc_id BIGINT, payload BINARY, media_type STRING, "
    "meta MAP<STRING, STRING>, embedding ARRAY<DOUBLE>"
)


def bundle(spark, sf_dir) -> DataFrame:
    """documents ⋈ embeddings → one struct-typed multimodal frame. The
    embeddings side is keyed 1:1 (vec_id == doc_id in the fixtures)."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("meta"),
        as_double("embedding").alias("embedding"),
        "label",
    )


def decode_media(records: DataFrame) -> DataFrame:
    """Decode/feature-extract stage over the binary payload as an
    Arrow-batched mapInPandas. Real codecs are not installed in this
    container, so the transform is a deterministic stand-in (byte length +
    first-byte "brightness"); swapping in PIL/librosa later changes ONLY
    the body of `extract`."""
    out_ddl = "doc_id BIGINT, n_bytes BIGINT, first_byte INT, media_type STRING"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "media_type": pdf["media_type"],
                }
            )

    return records.mapInPandas(extract, schema=out_ddl)


def resize_images(records: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image-resize stage: payload → resized payload + dimension metadata,
    as an Arrow-batched mapInPandas. No image codec ships in this container,
    so the pixel work is a clearly-marked deterministic stand-in (payload
    truncated/padded to width*height bytes — a fake "thumbnail" with the
    right buffer size); with PIL installed, ONLY the body of `resize_one`
    changes. Partition-local: no shuffle at any scale."""
    out_ddl = (
        "doc_id BIGINT, payload BINARY, media_type STRING, "
        "out_w INT, out_h INT, n_bytes BIGINT"
    )
    n_out = width * height

    def resize_one(b: bytes) -> bytes:
        # STUB: real impl = PIL.Image.open(BytesIO(b)).resize((w, h)).
        return bytes(b[:n_out]).ljust(n_out, b"\x00")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: resize_one(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "media_type": pdf["media_type"],
                    "out_w": width,
                    "out_h": height,
                    "n_bytes": resized.map(len).astype("int64"),
                }
            )

    return records.mapInPandas(run, schema=out_ddl)


def sample_frames(records: DataFrame, every_n_bytes: int = 32, max_frames: int = 4) -> DataFrame:
    """Video frame-sampling stage: one input row → up to ``max_frames``
    frame rows (row-expanding mapInPandas, the shape a real decoder needs).
    STUB decode: a "frame" is an ``every_n_bytes`` slice of the payload —
    deterministic; a real impl swaps in av/ffmpeg frame extraction with the
    same (doc_id, frame_idx, frame_payload) output contract."""
    out_ddl = "doc_id BIGINT, frame_idx INT, frame_payload BINARY, media_type STRING"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_payload": [], "media_type": []}
            for _, r in pdf.iterrows():
                blob = bytes(r["payload"])
                for idx in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    rows["doc_id"].append(r["doc_id"])
                    rows["frame_idx"].append(idx)
                    rows["frame_payload"].append(
                        blob[idx * every_n_bytes : (idx + 1) * every_n_bytes]
                    )
                    rows["media_type"].append(r["media_type"])
            yield pd.DataFrame(rows)

    return records.mapInPandas(run, schema=out_ddl)


@query(
    "q_llm_multimodal",
    priority=20,
    oracle="""
    SELECT d.doc_id,
           d.lang,
           'text/plain' AS media_type,
           octet_length(encode(d.text)) AS n_bytes,
           CAST(d.n_chars AS VARCHAR) AS meta_n_chars,
           round(sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x))), 6)
               AS emb_norm,
           e.label
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def q_llm_multimodal(spark, sf_dir):
    """C11: the struct-bundled multimodal row, flattened for the oracle —
    binary payload size, map-typed metadata access, embedding norm."""
    b = bundle(spark, sf_dir)
    return b.select(
        "doc_id",
        F.element_at("meta", "lang").alias("lang"),
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.element_at("meta", "n_chars").alias("meta_n_chars"),
        F.round(F.sqrt(sq_norm(F.col("embedding"))), 6).alias("emb_norm"),
        "label",
    )


_FRAME_BYTES = 32
_MAX_FRAMES = 4


@query(
    "q_llm_frame_sample",
    priority=30,
    oracle=f"""
    WITH b AS (
        SELECT d.doc_id, hex(encode(d.text)) AS blob_hex
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.text IS NOT NULL
    )
    SELECT doc_id,
           CAST(t.i AS INTEGER) AS frame_idx,
           substr(blob_hex, CAST(t.i AS INTEGER) * {2 * _FRAME_BYTES} + 1,
                  {2 * _FRAME_BYTES}) AS frame_hex,
           'text/plain' AS media_type
    FROM b, range(0, {_MAX_FRAMES}) t(i)
    WHERE t.i < greatest(1, length(blob_hex) // {2 * _FRAME_BYTES})
    """,
)
def q_llm_frame_sample(spark, sf_dir):
    """C11b: the frame-sampling mapInPandas stage, ORACLED — the stub
    decoder slices deterministic {_FRAME_BYTES}-byte "frames" off the
    payload, so the Python row-expanding stage can be cross-checked
    bit-for-bit against pure SQL (frames rendered as hex: byte-aligned, so
    slicing the hex string at {2 * _FRAME_BYTES}-char boundaries equals
    slicing the blob — DuckDB 1.0 has no BLOB substring). This pins the
    multimodal PLUMBING contract (row expansion, frame indexing, batch
    shapes) even though the real codec is environment-stubbed; swapping in
    av/ffmpeg changes only the decode body, not this verified shape. NULL
    payloads are filtered on both sides (a real decoder's
    corrupt-input-drop policy)."""
    b = bundle(spark, sf_dir).where(F.col("payload").isNotNull())
    frames = sample_frames(
        b.select("doc_id", "payload", "media_type"),
        every_n_bytes=_FRAME_BYTES,
        max_frames=_MAX_FRAMES,
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex("frame_payload").alias("frame_hex"),
        "media_type",
    )


_HEXD = "0123456789ABCDEF"


@query(
    "q_llm_decode_media",
    priority=30,
    oracle=f"""
    WITH b AS (
        SELECT d.doc_id, hex(encode(d.text)) AS blob_hex
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.text IS NOT NULL AND length(d.text) > 0
    )
    SELECT doc_id,
           CAST(length(blob_hex) // 2 AS BIGINT) AS n_bytes,
           CAST((strpos('{_HEXD}', substr(blob_hex, 1, 1)) - 1) * 16
                + (strpos('{_HEXD}', substr(blob_hex, 2, 1)) - 1)
               AS INTEGER) AS first_byte,
           'text/plain' AS media_type
    FROM b
    """,
)
def q_llm_decode_media(spark, sf_dir):
    """C11c: the decode/feature-extract mapInPandas stage, ORACLED — the
    stub decoder's outputs (payload byte length, first-byte "brightness")
    are deterministic, so the Arrow-batched Python stage cross-checks
    bit-for-bit against SQL. The first byte is recovered engine-neutrally
    from the payload's hex rendering via hex-digit position arithmetic
    (no BLOB indexing needed on either engine). Together with C11b this
    pins BOTH multimodal Python stages — per-row feature extraction and
    row expansion — to verified contracts; only the codec body inside
    `extract` is environment-stubbed. Empty payloads are filtered (the
    stub's first-byte read requires one byte; a real decoder's
    corrupt-input-drop policy)."""
    b = bundle(spark, sf_dir).where(
        F.col("payload").isNotNull() & (F.octet_length("payload") > 0)
    )
    decoded = decode_media(b.select("doc_id", "payload", "media_type"))
    return decoded.select("doc_id", "n_bytes", "first_byte", "media_type")
