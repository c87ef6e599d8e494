"""Cross-engine-exact cardinality/frequency sketches (SURVEY.md §2
C136–C137).

The xxhash64-seeded sketches (C3 MinHash, C37s Misra-Gries, C82s LSH) are
rows-only because DuckDB cannot replay Spark's hash. These two sketches are
instead built on a PORTABLE hash both engines compute bit-identically:
``md5(tok)`` (lowercase hex on both) parsed 8 hex digits at a time into
32-bit integers — so the sketch itself, not just its contract, is
SQL-oracled. The md5 parse is a fixed 8-term integer expression (no UDF, no
loop), and everything downstream is exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import parallel_table

_HEX = "0123456789abcdef"


def _hex_parse_spark(col: str, start: int) -> str:
    """Spark SQL expression: parse 8 hex chars of md5(col) starting at
    1-based position `start` into a BIGINT in [0, 2^32)."""
    terms = [
        f"(CAST(instr('{_HEX}', substr(md5({col}), {start + i}, 1))"
        f" AS BIGINT) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def _hex_parse_duck(col: str, start: int) -> str:
    """DuckDB twin of :func:`_hex_parse_spark` — strpos == instr."""
    terms = [
        f"(CAST(strpos('{_HEX}', substr(md5({col}), {start + i}, 1))"
        f" AS BIGINT) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


_KMV_K = 64


@query(
    "q_llm_kmv_distinct",
    priority=35,  # round-8 window full — driver row in r9
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
        WHERE text IS NOT NULL AND lang IS NOT NULL
    ),
    hashes AS (
        SELECT DISTINCT lang, {_hex_parse_duck("tok", 1)} AS h
        FROM toks
        WHERE tok <> ''
    ),
    ranked AS (
        SELECT lang, h,
               row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        FROM hashes
    ),
    counts AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_distinct
        FROM hashes GROUP BY lang
    ),
    kth AS (
        SELECT lang, h AS kth_hash FROM ranked WHERE rn = {_KMV_K}
    )
    SELECT c.lang AS lang,
           c.n_distinct AS n_distinct,
           CAST(coalesce(k.kth_hash, -1) AS BIGINT) AS kth_hash,
           CASE WHEN k.kth_hash IS NULL
                THEN round(CAST(c.n_distinct AS DOUBLE), 6)
                ELSE round(({_KMV_K} - 1.0) * 4294967296.0
                           / CAST(k.kth_hash AS DOUBLE), 6)
           END AS est_distinct
    FROM counts c LEFT JOIN kth k ON c.lang = k.lang
    """,
)
def q_llm_kmv_distinct(spark, sf_dir):
    """C136: KMV (k-minimum-values) distinct-count sketch per language —
    the mergeable cardinality estimator (Bar-Yossef et al. 2002) that,
    unlike C39's HLL (rows-only, Spark-internal), is built on the
    portable md5 hash so the ESTIMATE ITSELF is SQL-oracled: keep the
    {_KMV_K} smallest 32-bit hash values per group; the k-th smallest
    h_k estimates distinct = (k-1) * 2^32 / h_k. Exact-count column
    rides along for the error readout; groups with fewer than
    {_KMV_K} distinct values fall back to the exact count (the sketch
    IS exact below k).

    Exactness: hash = fixed 8-term integer parse of md5 hex (identical
    lowercase hex on both engines), dedup + rank over distinct integers
    (total order, no ties possible), estimate ONE float expression per
    group, round(6).

    Plan/scale: one corpus-scale distinct (lang, tok) rollup, then a
    per-lang window over |distinct hashes| rows. At 100 TB the rollup
    is the only data-scale job; a production variant keeps only each
    partition's k smallest per group before the exchange (min-heap
    semantics via partial aggregation), which this plan's groupBy
    already approximates with map-side combine on the distinct."""
    toks = (
        parallel_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select(
            "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .select("lang", "tok")
        .distinct()
    )
    hashes = toks.select(
        "lang", F.expr(_hex_parse_spark("tok", 1)).alias("h")
    ).distinct()
    w = Window.partitionBy("lang").orderBy(F.col("h").asc())
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    counts = hashes.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct")
    )
    kth = ranked.where(F.col("rn") == _KMV_K).select(
        "lang", F.col("h").alias("kth_hash")
    )
    est = F.when(
        F.col("kth_hash").isNull(),
        F.round(F.col("n_distinct").cast("double"), 6),
    ).otherwise(
        F.round(
            F.lit(float(_KMV_K - 1))
            * F.lit(4294967296.0)
            / F.col("kth_hash").cast("double"),
            6,
        )
    )
    return counts.join(kth, "lang", "left").select(
        "lang",
        "n_distinct",
        F.coalesce(F.col("kth_hash"), F.lit(-1)).cast("bigint").alias(
            "kth_hash"
        ),
        est.alias("est_distinct"),
    )


_CMS_W = 1024  # counters per row
_CMS_D = 4  # rows: the four independent 8-hex-digit chunks of one md5
_CMS_TOPN = 10


@query(
    "q_llm_cms_heavy",
    priority=35,  # round-8 window full — driver row in r9
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents
        WHERE text IS NOT NULL
    ),
    tc AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE tok <> '' GROUP BY tok
    ),
    buckets AS (
        SELECT tok, c,
               {", ".join(f"({_hex_parse_duck('tok', 1 + 8 * j)}) % {_CMS_W} AS b{j}" for j in range(_CMS_D))}
        FROM tc
    ),
    cells AS (
        {" UNION ALL ".join(f"SELECT {j} AS row_id, b{j} AS bucket, c FROM buckets" for j in range(_CMS_D))}
    ),
    counters AS (
        SELECT row_id, bucket, CAST(sum(c) AS BIGINT) AS cnt
        FROM cells GROUP BY row_id, bucket
    ),
    heavy AS (
        SELECT tok, c, {", ".join(f"b{j}" for j in range(_CMS_D))}
        FROM buckets
        ORDER BY c DESC, tok
        LIMIT {_CMS_TOPN}
    )
    SELECT h.tok AS tok, h.c AS exact_count,
           least({", ".join(f"k{j}.cnt" for j in range(_CMS_D))}) AS cms_est,
           CAST(least({", ".join(f"k{j}.cnt" for j in range(_CMS_D))}) - h.c
                AS BIGINT) AS overestimate
    FROM heavy h
    {" ".join(f"JOIN counters k{j} ON k{j}.row_id = {j} AND k{j}.bucket = h.b{j}" for j in range(_CMS_D))}
    """,
)
def q_llm_cms_heavy(spark, sf_dir):
    """C137: count-min sketch (Cormode & Muthukrishnan 2005) over the
    corpus token stream — the {_CMS_D}x{_CMS_W} counter matrix whose
    point query min_j counters[j][h_j(tok)] upper-bounds every token's
    true frequency; read out here for the top-{_CMS_TOPN} exact heavy
    hitters with their guaranteed-nonnegative overestimate. The
    fixed-memory frequency twin of C136's cardinality sketch, and the
    SQL-oracled counterpart of C37s's Misra-Gries keyed state: a 100 TB
    ingest keeps {_CMS_D}x{_CMS_W} BIGINTs per executor and merges by
    addition.

    Exactness: the {_CMS_D} row hashes are the four INDEPENDENT
    8-hex-digit chunks of one md5 (no reseeding needed — md5's chunks
    are pairwise independent for this purpose), parsed by the same
    fixed integer expression on both engines, bucketed by % {_CMS_W}
    (nonnegative dividend, so truncation vs floor cannot diverge);
    counters and estimates are pure integer sums/mins; the heavy list
    is ordered by (count DESC, tok) — a total order.

    Plan/scale: one corpus-scale explode+groupBy(tok) (term
    frequencies), then every sketch frame is KB-sized: the counter
    matrix aggregates {_CMS_D}x|vocab| cells to {_CMS_D}x{_CMS_W}
    rows with map-side combine; the readout joins {_CMS_TOPN} rows
    against broadcast counters."""
    tc = (
        parallel_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    buckets = tc.select(
        "tok",
        "c",
        *[
            (F.expr(_hex_parse_spark("tok", 1 + 8 * j)) % _CMS_W).alias(
                f"b{j}"
            )
            for j in range(_CMS_D)
        ],
    ).localCheckpoint(eager=True)
    cells = None
    for j in range(_CMS_D):
        part = buckets.select(
            F.lit(j).alias("row_id"),
            F.col(f"b{j}").alias("bucket"),
            "c",
        )
        cells = part if cells is None else cells.unionByName(part)
    counters = cells.groupBy("row_id", "bucket").agg(
        F.sum("c").cast("bigint").alias("cnt")
    )
    heavy = buckets.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(
        _CMS_TOPN
    )
    out = heavy
    for j in range(_CMS_D):
        kj = counters.where(F.col("row_id") == j).select(
            F.col("bucket").alias(f"_bk{j}"), F.col("cnt").alias(f"cnt{j}")
        )
        out = out.join(
            F.broadcast(kj), F.col(f"b{j}") == F.col(f"_bk{j}")
        )
    est = F.least(*[F.col(f"cnt{j}") for j in range(_CMS_D)])
    return out.select(
        "tok",
        F.col("c").alias("exact_count"),
        est.alias("cms_est"),
        (est - F.col("c")).cast("bigint").alias("overestimate"),
    )
