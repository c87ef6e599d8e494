"""C126-stream: continuous near-dup ingest screening (round 8).

The streaming form of ``llm/ingest.py``'s delta-vs-corpus MinHash band
probe: the corpus band index / signature table / hash set are the STATIC
sides (slowly-changing, rebuilt by the batch pipeline), and every
micro-batch probes only its own arrivals through stream-static joins —
the production shape for a living corpus, where near-dedup cost per
trigger is |arrivals| x bands, never |corpus|.

Signature computation here is PER ROW (array_min over a transform — no
explode, no groupBy), which is both the only stream-safe form (a
stateless scan-stage expression) and bit-identical to the batch
explode+groupBy signatures (pinned by tests/test_streaming.py). NOTE the
``F.transform`` closure discipline: the lambda must take ONE argument —
a two-parameter lambda would receive (element, index) and silently hash
the wrong seed (the round-6 lesson, re-hit and re-pinned this round).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm.ingest import _NEARDUP_BANDS, _NEARDUP_K, _NEARDUP_MIN_AGREE


def with_signatures(df, text_col="text", sig_family: str = "portable"):
    """Append h0..h{k-1} MinHash signature columns as scan-stage
    expressions (stream-safe: no shuffle; batch-identical: the same
    per-token hash min as the batch groupBy builder). ``sig_family``
    mirrors the batch option (round 12): "portable" = the C140 affine
    permutations over one md5-parse per distinct token (cross-engine
    deterministic, the registered default), "xxhash64" = the cheaper
    JVM-hash path."""
    from ..llm.dedup import _MH_SIG_TERMS
    from ..llm.sketches import _hex_parse_spark

    if sig_family == "portable":
        hs = (
            f"transform(filter(array_distinct(split({text_col}, ' ')),"
            f" t -> t <> ''), t -> {_hex_parse_spark('t', 1)})"
        )
        staged = df.select("*", F.expr(hs).alias("_hs"))
        return staged.select(
            *[c for c in df.columns],
            *[
                F.expr(
                    f"array_min(transform(_hs, h -> {g.format(h='h')}))"
                ).alias(f"h{i}")
                for i, g in enumerate(_MH_SIG_TERMS)
            ],
        )
    toks = F.filter(
        F.array_distinct(F.split(F.col(text_col), " ")),
        lambda t: t != "",
    )
    return df.select(
        "*",
        *[
            F.array_min(
                F.transform(toks, lambda t, j=i: F.xxhash64(t, F.lit(j)))
            ).alias(f"h{i}")
            for i in range(_NEARDUP_K)
        ],
    )


def _band_structs():
    rows_per_band = _NEARDUP_K // _NEARDUP_BANDS
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(_NEARDUP_BANDS)
        ]
    )


def corpus_neardup_index(corpus_docs):
    """Build the three static frames the streaming screen probes:
    (bands, sigs, hashes). ``corpus_docs`` has (doc_id, text). At 100 TB
    these are persistent bucketed tables the batch pipeline maintains;
    here they are derived frames the stream-static joins broadcast/probe."""
    sigs = with_signatures(corpus_docs.select("doc_id", "text")).drop("text")
    bands = sigs.select(
        F.col("doc_id").alias("cd"), F.explode(_band_structs()).alias("bb")
    ).select("cd", "bb.band", "bb.bucket")
    corpus_sigs = sigs.select(
        F.col("doc_id").alias("cd"),
        *[F.col(f"h{i}").alias(f"ch{i}") for i in range(_NEARDUP_K)],
    )
    hashes = corpus_docs.select(
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("h")
    ).distinct()
    return bands, corpus_sigs, hashes


def streaming_neardup_flags(doc_stream, corpus_index):
    """(near_stream, exact_stream): two streaming frames of flagged
    arrival doc ids. ``near``: the arrival shares a band bucket with a
    corpus doc AND >= {_NEARDUP_MIN_AGREE}/{_NEARDUP_K} signature rows
    agree (the batch C126 rule, candidate-verified per micro-batch —
    every join here is stream-static, so each trigger's cost is its own
    arrivals x bands). ``exact``: content-hash already in the corpus
    (stream-static left-semi, the C46 screen). Each arrival doc is
    emitted at most once per flag (dropDuplicates keyed state on the
    near side; the exact side is one row per arrival by construction)."""
    bands, corpus_sigs, hashes = corpus_index
    s = with_signatures(doc_stream.select("doc_id", "lang", "text")).drop("text")
    s_bands = s.select(
        "doc_id", "lang",
        *[f"h{i}" for i in range(_NEARDUP_K)],
        F.explode(_band_structs()).alias("bb"),
    ).select(
        "doc_id", "lang", *[f"h{i}" for i in range(_NEARDUP_K)],
        "bb.band", "bb.bucket",
    )
    agree = sum(
        F.when(F.col(f"h{i}") == F.col(f"ch{i}"), 1).otherwise(0)
        for i in range(_NEARDUP_K)
    )
    near = (
        s_bands.join(bands, ["band", "bucket"])
        .join(corpus_sigs, "cd")
        .where(agree >= _NEARDUP_MIN_AGREE)
        .select("doc_id", "lang")
        .dropDuplicates(["doc_id"])
    )
    exact = (
        doc_stream.select(
            "doc_id",
            "lang",
            F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("h"),
        )
        .join(hashes, "h", "left_semi")
        .select("doc_id", "lang")
    )
    return near, exact
