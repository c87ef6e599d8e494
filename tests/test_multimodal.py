"""Multimodal plumbing harness (SURVEY.md north-star): the binary-payload
mapInPandas decode path must be schema-stable, batch-shaped, and
deterministic — codecs are stubbed (none installed here), plumbing is real.
"""

from __future__ import annotations

from spark_kinesis_sql_asl_spark.llm.multimodal import (
    bundle,
    decode_media,
    resize_images,
    sample_frames,
)

from .conftest import SF_ORACLE


def test_bundle_schema_and_join_cardinality(spark):
    b = bundle(spark, SF_ORACLE)
    assert dict(b.dtypes)["payload"] == "binary"
    assert dict(b.dtypes)["meta"] == "map<string,string>"
    assert dict(b.dtypes)["embedding"] == "array<double>"
    assert b.count() == 500  # 1:1 doc↔embedding join (fixtures)


def test_decode_media_roundtrip_values(spark):
    b = bundle(spark, SF_ORACLE)
    out = decode_media(b)
    rows = {r.doc_id: r for r in out.collect()}
    src = {r.doc_id: r for r in b.select("doc_id", "payload").collect()}
    assert len(rows) == len(src)
    for doc_id, r in list(rows.items())[:50]:
        payload = src[doc_id].payload
        assert r.n_bytes == len(payload)
        assert r.first_byte == payload[0]
        assert r.media_type == "text/plain"


def test_decode_media_partitioning_preserved(spark):
    # mapInPandas must not force a shuffle: partition count is preserved.
    b = bundle(spark, SF_ORACLE).repartition(4)
    out = decode_media(b)
    assert out.rdd.getNumPartitions() == 4


def test_resize_images_buffer_contract(spark):
    b = bundle(spark, SF_ORACLE)
    out = resize_images(b, width=16, height=8)
    rows = out.collect()
    assert len(rows) == b.count()
    assert all(r.n_bytes == 16 * 8 for r in rows)
    assert all(len(r.payload) == 16 * 8 for r in rows)
    assert all(r.out_w == 16 and r.out_h == 8 for r in rows)


def test_sample_frames_expands_rows_deterministically(spark):
    b = bundle(spark, SF_ORACLE)
    out = sample_frames(b, every_n_bytes=32, max_frames=3)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    src = {r.doc_id: bytes(r.payload) for r in b.select("doc_id", "payload").collect()}
    assert set(per_doc) == set(src)
    for doc_id, frames in list(per_doc.items())[:50]:
        blob = src[doc_id]
        expect = min(3, max(1, len(blob) // 32))
        assert sorted(f.frame_idx for f in frames) == list(range(expect))
        for f in frames:
            lo = f.frame_idx * 32
            assert bytes(f.frame_payload) == blob[lo : lo + 32]


def test_sniff_modality_handcrafted_payloads(spark):
    # The router is real logic: verify each signature, the unknown-binary
    # fallthrough, empty payloads, and a signature PREFIX that must NOT
    # match (2 of JPEG's 3 bytes).
    from spark_kinesis_sql_asl_spark.llm.multimodal import sniff_modality

    cases = [
        (0, bytes.fromhex("ffd8ff") + b"rest", "jpeg"),
        (1, bytes.fromhex("89504e470d0a1a0a") + b"x", "png"),
        (2, b"RIFF....WAVE", "riff"),
        (3, b"%PDF-1.7 ...", "pdf"),
        (4, b"GIF89a.....", "gif"),
        (5, b"plain old text", "text"),
        (6, b"", "text"),
        (7, bytes.fromhex("ffd8") + b"truncated magic", "text"),
        (8, bytes.fromhex("89504e47") + b"half a png magic", "text"),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in cases], "doc_id bigint, payload binary"
    )
    got = {r.doc_id: (r.detected, r.n_bytes) for r in sniff_modality(df).collect()}
    for i, p, want in cases:
        assert got[i] == (want, len(p)), f"payload {i}: {got[i]} != {want}"
