"""Corpus-statistical document scoring (SURVEY.md §2 rows C48–C49):
unigram-surprisal scoring and rare-token novelty.

The two corpus-relative quality signals between heuristic scoring (C17,
within-doc features only) and model-based filtering (out of scope): how
*predictable* a document is under the corpus unigram distribution, and how
much of its vocabulary is corpus-rare. Both run in EXACT integer
arithmetic: surprisal uses the bit-length identity ``floor(log2(n)) =
length(bin(n)) - 1`` — ``bin()`` renders identically on Spark and DuckDB,
so no libm ``log`` call (whose last-ulp behavior is engine-specific) ever
touches the output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

# freq_ppm <= 1e6 < 2^20, so surprisal_bits = 20 - floor(log2(freq_ppm))
# lands in [1, 20]; greatest(1, ppm) guards tokens whose floor-div ppm
# rounds to zero.
_SURPRISAL = "21 - length(bin(greatest(1, freq_ppm)))"


@query(
    "q_llm_surprisal",
    priority=30,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok
        FROM documents
    ),
    t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    freq AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS n_occ FROM t GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(n_occ) AS BIGINT) AS total FROM freq),
    fppm AS (
        SELECT tok, CAST((1000000 * n_occ) // total AS BIGINT) AS freq_ppm
        FROM freq, tot
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum({_SURPRISAL}) AS BIGINT) AS total_bits,
           CAST((1000 * sum({_SURPRISAL})) // count(*) AS BIGINT)
               AS bits_per_tok_milli
    FROM t JOIN fppm ON t.tok = fppm.tok
    GROUP BY t.doc_id
    """,
)
def q_llm_surprisal(spark, sf_dir):
    """C48: unigram-surprisal scoring — each document's total information
    content under the corpus's own unigram distribution (the classic
    LM-filter proxy: too-low bits/token = boilerplate/repetitive, too-high
    = garbage/noise; both tails get culled). Surprisal per token is the
    integer bit-cost ``20 - floor(log2(freq_ppm))`` computed via binary
    string length — bit-exact on every engine, no float log fold. Plan:
    the frequency table is one (tok) rollup with map-side partial counts;
    the corpus total rides a 1-row broadcast; the token⋈freq equi-join
    shuffles (tok, doc_id) pairs — never text — and the per-doc rollup
    partial-aggregates. At 100 TB the freq table is |vocab| rows (fits the
    C37 analysis: broadcast below ~100M tokens, bucket-join above; the
    sketch fallback is Count-Min estimated ppm feeding the same bit-cost
    expression)."""
    t = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    freq = t.groupBy("tok").agg(F.count(F.lit(1)).alias("n_occ"))
    tot = freq.agg(F.sum("n_occ").cast("bigint").alias("total"))
    fppm = freq.join(F.broadcast(tot)).select(
        "tok",
        F.expr("CAST((1000000 * n_occ) div total AS BIGINT)").alias(
            "freq_ppm"
        ),
    )
    return (
        t.join(fppm, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.expr(f"CAST(sum({_SURPRISAL}) AS BIGINT)").alias("total_bits"),
            F.expr(
                f"CAST((1000 * sum({_SURPRISAL})) div count(1) AS BIGINT)"
            ).alias("bits_per_tok_milli"),
        )
    )


_RARE_MAX_DF = 2


@query(
    "q_llm_novelty",
    priority=30,
    oracle=f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(string_split(coalesce(text, ''), ' ')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    df AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS doc_freq FROM dt GROUP BY tok
    )
    SELECT dt.doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(count(CASE WHEN df.doc_freq <= {_RARE_MAX_DF} THEN 1 END)
               AS BIGINT) AS n_rare,
           CAST((1000000 * count(CASE WHEN df.doc_freq <= {_RARE_MAX_DF}
                                      THEN 1 END)) // count(*) AS BIGINT)
               AS rare_ppm
    FROM dt JOIN df ON dt.tok = df.tok
    GROUP BY dt.doc_id
    """,
)
def q_llm_novelty(spark, sf_dir):
    """C49: rare-token novelty — the fraction of each document's distinct
    vocabulary that is corpus-rare (document frequency ≤ {_RARE_MAX_DF}).
    The complementary outlier signal to C31 (repetition is within-doc;
    novelty is corpus-relative): a high rare_ppm doc is OCR noise, code in
    a prose corpus, or genuinely fresh content — exactly the bucket a
    curation pass routes to review or a dedicated pipeline. Same
    distinct-explode → df-rollup → membership-join shape as C37's exact
    path; only (doc_id, tok) pairs and (tok, doc_freq) rows shuffle. At
    100 TB the df table IS the C27 inverted-index df column — a pipeline
    computes it once and feeds both."""
    dt = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.split(F.coalesce(F.col("text"), F.lit("")), " ")
                )
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("doc_freq"))
    rare = F.when(F.col("doc_freq") <= _RARE_MAX_DF, 1)
    return (
        dt.join(df, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.count(rare).alias("n_rare"),
            F.expr(
                f"CAST((1000000 * count(CASE WHEN doc_freq <= {_RARE_MAX_DF} "
                "THEN 1 END)) div count(1) AS BIGINT)"
            ).alias("rare_ppm"),
        )
    )
