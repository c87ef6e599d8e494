"""Vector / clustering operators beyond the assignment step (SURVEY.md §2
rows C39–C40): the k-means M-step (centroid recompute) and product
quantization encoding.

Together with C33 (the E-step) and C24 (int8 quantization) these complete
the embedding-compression toolchain a 100 TB corpus needs for clustering
and ANN: E-step → M-step closes the Lloyd iteration, and PQ codes are the
storage/recall format IVF-PQ indexes serve from (Jégou et al., PAMI 2011).
Everything runs on the C24 integer grid — squared-L2, sums, and floor-div
means in pure BIGINT arithmetic — so results are bit-identical across
engines and partitionings (the driver-canon rule).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table
from .curation import _KMEANS_K, _Q_VEC_SQL_DUCK, _Q_VEC_SQL_SPARK

# Shared DuckDB CTE: quantize + seed + assign (identical to C33's oracle,
# re-stated here so each oracle stays self-contained for the driver).
_ASSIGN_CTES_DUCK = f"""
    q AS (
        SELECT vec_id, {_Q_VEC_SQL_DUCK} AS qv FROM embeddings
    ),
    seeds AS (SELECT vec_id AS seed_id, qv AS sv FROM q WHERE vec_id < {_KMEANS_K}),
    dists AS (
        SELECT q.vec_id, s.seed_id,
               list_sum(list_transform(range(1, 65),
                   i -> (qv[i] - sv[i]) * (qv[i] - sv[i]))) AS dist
        FROM q CROSS JOIN seeds s
    ),
    assign AS (
        SELECT vec_id, seed_id, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, seed_id) AS rn
        FROM dists
    )
"""


def _assigned(spark, sf_dir):
    """Shared Spark assignment frame: (vec_id, cell_id, qv) at rn=1 —
    the C33 E-step re-expressed as a reusable building block."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_Q_VEC_SQL_SPARK).alias("qv")
    )
    seeds = e.where(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("seed_id"), F.col("qv").alias("sv")
    )
    dists = e.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "qv",
        "seed_id",
        F.expr(
            "aggregate(sequence(1, 64), CAST(0 AS BIGINT), (acc, i) -> "
            "acc + (element_at(qv, i) - element_at(sv, i)) * "
            "(element_at(qv, i) - element_at(sv, i)))"
        ).alias("dist"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "seed_id")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("seed_id").alias("cell_id"), "qv")
    )


@query(
    "q_llm_kmeans_mstep",
    priority=30,
    oracle=f"""
    WITH {_ASSIGN_CTES_DUCK},
    av AS (
        SELECT a.seed_id AS cell_id, q.qv
        FROM assign a JOIN q ON a.vec_id = q.vec_id
        WHERE a.rn = 1
    ),
    dims AS (
        SELECT cell_id, t.i AS dim, qv[t.i + 1] AS qval
        FROM av, range(0, 64) t(i)
    )
    SELECT cell_id, dim,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(qval) AS BIGINT) AS sum_q,
           CAST(sum(qval) // count(*) AS BIGINT) AS centroid_q
    FROM dims GROUP BY cell_id, dim
    """,
)
def q_llm_kmeans_mstep(spark, sf_dir):
    """C39: the k-means M-step — recompute each cell's centroid from its
    assigned vectors, completing one full Lloyd iteration with C33. The
    centroid is emitted per (cell, dim) as an integer floor-mean on the C24
    grid ({_KMEANS_K}×64 rows), so the next E-step can consume it without
    any float crossing an engine boundary. Plan: the assignment frame
    (broadcast seeds, scan-stage distance fold, per-vector argmin window)
    flows into one posexplode + groupBy(cell, dim) — the shuffle carries
    (cell, dim, qval) triples with map-side partial sums, bounded by
    64·|vectors| small integers, never the raw embedding arrays. At 100 TB
    the M-step is exactly this rollup; iterating Lloyd is a loop of
    (broadcast centroids → assign → this), with each round's centroid
    table {_KMEANS_K}×64 rows — trivially broadcastable."""
    exploded = _assigned(spark, sf_dir).select(
        "cell_id", F.posexplode("qv").alias("dim", "qval")
    )
    return exploded.groupBy("cell_id", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("qval").cast("bigint").alias("sum_q"),
        F.expr("CAST(sum(qval) div count(1) AS BIGINT)").alias("centroid_q"),
    )


_PQ_SUBSPACES = 8
_PQ_SUBDIM = 8  # 64 dims / 8 subspaces


@query(
    "q_llm_pq_encode",
    priority=30,
    oracle=f"""
    WITH q AS (
        SELECT vec_id, {_Q_VEC_SQL_DUCK} AS qv FROM embeddings
    ),
    seeds AS (SELECT vec_id AS seed_id, qv AS sv FROM q WHERE vec_id < {_KMEANS_K}),
    sub AS (
        SELECT q.vec_id, s.seed_id, t.i AS subspace,
               list_sum(list_transform(range(1, {_PQ_SUBDIM + 1}),
                   j -> (qv[t.i * {_PQ_SUBDIM} + j] - sv[t.i * {_PQ_SUBDIM} + j])
                      * (qv[t.i * {_PQ_SUBDIM} + j] - sv[t.i * {_PQ_SUBDIM} + j])))
                   AS dist
        FROM q CROSS JOIN seeds s CROSS JOIN range(0, {_PQ_SUBSPACES}) t(i)
    )
    SELECT vec_id, subspace, seed_id AS code, CAST(dist AS BIGINT) AS dist
    FROM (
        SELECT vec_id, subspace, seed_id, dist,
               row_number() OVER (
                   PARTITION BY vec_id, subspace ORDER BY dist, seed_id
               ) AS rn
        FROM sub
    ) WHERE rn = 1
    """,
)
def q_llm_pq_encode(spark, sf_dir):
    """C40: product-quantization encoding (Jégou et al., PAMI 2011) — split
    each 64-d vector into {_PQ_SUBSPACES} subvectors of {_PQ_SUBDIM} dims
    and assign each to its nearest sub-codeword ({_KMEANS_K} deterministic
    codewords per subspace: the first {_KMEANS_K} vectors' subvectors, the
    C33 seeding convention). The emitted (vec_id, subspace, code) triples
    are the compressed representation an IVF-PQ index stores — 8 small
    codes instead of 64 floats, a 32× compression at recall governed by the
    codebook. All distances are integer squared-L2 on the C24 grid, so the
    argmin can never flip on a float ulp. Plan: codebook broadcasts
    ({_KMEANS_K} rows); the subspace expansion is a scan-stage explode
    (×{_PQ_SUBSPACES}); the per-(vector, subspace) argmin is a window over
    {_KMEANS_K}-row groups. At 100 TB: identical shape — no shuffle
    touches the raw vectors, and the encode is embarrassingly parallel."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_Q_VEC_SQL_SPARK).alias("qv")
    )
    seeds = e.where(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("seed_id"), F.col("qv").alias("sv")
    )
    sub = (
        e.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "seed_id",
            "qv",
            "sv",
            F.explode(F.sequence(F.lit(0), F.lit(_PQ_SUBSPACES - 1))).alias(
                "subspace"
            ),
        )
        .select(
            "vec_id",
            "seed_id",
            "subspace",
            F.expr(
                f"aggregate(sequence(1, {_PQ_SUBDIM}), CAST(0 AS BIGINT), "
                f"(acc, j) -> acc + "
                f"(element_at(qv, subspace * {_PQ_SUBDIM} + j) - "
                f" element_at(sv, subspace * {_PQ_SUBDIM} + j)) * "
                f"(element_at(qv, subspace * {_PQ_SUBDIM} + j) - "
                f" element_at(sv, subspace * {_PQ_SUBDIM} + j)))"
            ).alias("dist"),
        )
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("dist", "seed_id")
    return (
        sub.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            "subspace",
            F.col("seed_id").alias("code"),
            F.col("dist").cast("bigint").alias("dist"),
        )
    )
