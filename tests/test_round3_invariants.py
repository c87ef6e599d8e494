"""Semantic invariants for the round-3 operator additions (SURVEY.md §2
B93–B95, C39–C47) — properties the SQL oracle cannot express because they
are ABOUT the operator's contract, not a reference answer: conservation
(counts partition the input), bounds (LPT balance, code ranges), and
permutation/determinism guarantees.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from spark_kinesis_sql_asl_spark.registry import all_queries
from spark_kinesis_sql_asl_spark.tables import table

from .conftest import SF_ORACLE

QUERIES = all_queries()


def test_sessionize_partitions_every_event(spark):
    # Conservation: sessions partition each user's events — per-user
    # session event counts sum to the user's event count, and session ids
    # are 1..n_sessions without gaps.
    sess = QUERIES["q_events_sessionize"](spark, SF_ORACLE).collect()
    ev_counts = {
        r["user_id"]: r["n"]
        for r in table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_user = defaultdict(list)
    for r in sess:
        per_user[r["user_id"]].append(r)
    assert set(per_user) == set(ev_counts)
    for uid, rows in per_user.items():
        assert sum(r["n_events"] for r in rows) == ev_counts[uid]
        ids = sorted(r["session_id"] for r in rows)
        assert ids == list(range(1, len(ids) + 1))
        assert all(r["duration_us"] >= 0 for r in rows)


def test_cohort_retention_day_zero_covers_all_users(spark):
    # Every user is active on their own cohort day, so summing n_active at
    # day_offset=0 over all cohorts counts every user exactly once.
    rows = QUERIES["q_events_cohort_retention"](spark, SF_ORACLE).collect()
    n_users = (
        table(spark, SF_ORACLE, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_active"] for r in rows if r["day_offset"] == 0) == n_users
    assert all(r["day_offset"] >= 0 for r in rows)


def test_train_order_positions_are_per_shard_permutations(spark):
    rows = QUERIES["q_llm_train_order"](spark, SF_ORACLE).collect()
    n_docs = table(spark, SF_ORACLE, "documents").count()
    assert len(rows) == n_docs
    per_shard = defaultdict(list)
    for r in rows:
        per_shard[r["shard"]].append(r["pos"])
    for shard, poss in per_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shard_balance_spread_bounded_by_max_doc(spark):
    # LPT striping guarantee: within a lang, descending round-robin keeps
    # the shard token-sum spread at most the largest single document
    # (telescoping over consecutive rank picks).
    rows = QUERIES["q_llm_shard_balance"](spark, SF_ORACLE).collect()
    max_doc = {
        r["lang"]: r["m"]
        for r in table(spark, SF_ORACLE, "documents")
        .groupBy("lang")
        .agg(F.expr("max(size(split(coalesce(text, ''), ' ')))").alias("m"))
        .collect()
    }
    per_lang = defaultdict(list)
    for r in rows:
        per_lang[r["lang"]].append(r["sum_tokens"])
    for lang, sums in per_lang.items():
        assert max(sums) - min(sums) <= max_doc[lang], lang


def test_pq_encode_full_code_grid(spark):
    # Every vector gets exactly 8 subspace codes, each in [0, 16).
    rows = QUERIES["q_llm_pq_encode"](spark, SF_ORACLE).collect()
    n_vecs = table(spark, SF_ORACLE, "embeddings").count()
    assert len(rows) == n_vecs * 8
    assert all(0 <= r["code"] < 16 for r in rows)
    assert all(0 <= r["subspace"] < 8 for r in rows)
    assert all(r["dist"] >= 0 for r in rows)


def test_kmeans_mstep_conserves_vectors_per_dim(spark):
    # For every dim, cell populations partition the vector set; and the
    # floor-mean centroid lies within the quantized grid's actual range.
    rows = QUERIES["q_llm_kmeans_mstep"](spark, SF_ORACLE).collect()
    n_vecs = table(spark, SF_ORACLE, "embeddings").count()
    per_dim = defaultdict(int)
    for r in rows:
        per_dim[r["dim"]] += r["n_vecs"]
        # SQL `div` truncates toward zero (both engines — oracle-verified),
        # so the expected centroid is sign-carrying truncated division.
        trunc = abs(r["sum_q"]) // r["n_vecs"]
        expected = trunc if r["sum_q"] >= 0 else -trunc
        assert r["centroid_q"] == expected
    assert set(per_dim) == set(range(64))
    assert all(v == n_vecs for v in per_dim.values())


def test_quality_calibrate_deciles_balanced(spark):
    # ntile contract: within each lang, bucket sizes differ by at most 1
    # and every decile 1..10 is populated (n >> 10 per lang here).
    rows = QUERIES["q_llm_quality_calibrate"](spark, SF_ORACLE).collect()
    per = defaultdict(lambda: defaultdict(int))
    for r in rows:
        per[r["lang"]][r["decile"]] += 1
    for lang, buckets in per.items():
        assert set(buckets) == set(range(1, 11)), lang
        sizes = list(buckets.values())
        assert max(sizes) - min(sizes) <= 1, lang


def test_ingest_dedup_counts_partition_batch(spark):
    rows = QUERIES["q_llm_ingest_dedup"](spark, SF_ORACLE).collect()
    n_batch = (
        table(spark, SF_ORACLE, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .count()
    )
    assert sum(r["n_batch"] for r in rows) == n_batch
    for r in rows:
        assert r["n_dup"] + r["n_novel"] == r["n_batch"]
        assert 0 <= r["novel_ppm"] <= 1_000_000


def test_mixture_sample_keeps_underrepresented_sources_whole(spark):
    rows = QUERIES["q_llm_mixture_sample"](spark, SF_ORACLE).collect()
    assert rows, "no sources"
    for r in rows:
        assert 0 <= r["kept_ppm"] <= 1_000_000
        assert 0 <= r["n_kept"] <= r["n_total"]
        if r["bound_ppm"] >= 1_000_000:
            assert r["n_kept"] == r["n_total"], r["source"]


def test_bitext_pairs_are_cross_language(spark):
    rows = QUERIES["q_llm_bitext_mine"](spark, SF_ORACLE).collect()
    assert rows, "fixture should yield cross-lang candidates"
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert r["cosine"] >= 0.3


def test_embed_dimstats_covers_grid(spark):
    # 64 dims, each counting every vector; min <= max; sumsq consistent
    # with the extremes (|sum| <= n * max(|min|,|max|)).
    rows = QUERIES["q_llm_embed_dimstats"](spark, SF_ORACLE).collect()
    n_vecs = table(spark, SF_ORACLE, "embeddings").count()
    assert sorted(r["dim"] for r in rows) == list(range(64))
    for r in rows:
        assert r["n"] == n_vecs
        assert r["min_q"] <= r["max_q"]
        bound = max(abs(r["min_q"]), abs(r["max_q"]))
        assert abs(r["sum_q"]) <= r["n"] * bound
        assert r["sumsq_q"] <= r["n"] * bound * bound


def test_composition_rows_sum_to_total(spark):
    rows = QUERIES["q_llm_composition"](spark, SF_ORACLE).collect()
    n_docs = table(spark, SF_ORACLE, "documents").count()
    assert sum(r["n_total"] for r in rows) == n_docs
    for r in rows:
        parts = (
            r["n_en"] + r["n_de"] + r["n_es"] + r["n_fr"] + r["n_zh"]
            + r["n_other"]
        )
        assert parts == r["n_total"], r["src"]


# --- round-6 additions: C104 dup-span ratio, C105 AUC, C106 DSIR --------------


def test_dup_span_ratio_bounds(spark):
    """boiler count never exceeds chunk count; ppm in [0, 1e6]; the drop
    verdict agrees with the ppm threshold row by row."""
    rows = QUERIES["q_llm_dup_span_ratio"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_chunks
        assert 0 <= r.boiler_ppm <= 1_000_000
        assert r.flag_drop == (r.boiler_ppm >= 300_000)


def test_dup_span_ratio_detects_full_duplicates(spark):
    """Exact duplicate texts (the fixture's C1 dup pairs) must score
    1e6 ppm — every chunk of a duplicated doc is by definition shared."""
    import pyspark.sql.functions as F

    from spark_kinesis_sql_asl_spark.tables import table

    d = table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    dup_ids = {
        r.doc_id
        for r in d.join(
            d.groupBy("text").agg(F.count("*").alias("c")).where("c > 1"),
            "text",
        ).collect()
        if r.text is not None and len(r.text) >= 32
    }
    if not dup_ids:  # fixture has no exact dups at this SF
        return
    ppm = {
        r.doc_id: r.boiler_ppm
        for r in QUERIES["q_llm_dup_span_ratio"](spark, SF_ORACLE).collect()
    }
    for i in dup_ids:
        assert ppm.get(i) == 1_000_000, f"doc {i}: {ppm.get(i)}"


def test_quality_auc_range_and_population(spark):
    """AUC ppm must sit in [0, 1e6] and each lang row must account for
    every doc of that language (pos + neg = lang total)."""
    import pyspark.sql.functions as F

    from spark_kinesis_sql_asl_spark.tables import table

    rows = QUERIES["q_llm_quality_auc"](spark, SF_ORACLE).collect()
    assert rows
    totals = {
        r.lang: r.c
        for r in table(spark, SF_ORACLE, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for r in rows:
        assert 0 <= r.auc_ppm <= 1_000_000
        assert r.n_pos + r.n_neg == totals[r.lang]


def test_dsir_weight_trusted_docs_skew_positive(spark):
    """Docs from the trusted slice must average a higher octave weight
    than the rest — the defining property of an importance weight (the
    target slice is, by construction, more target-like)."""
    import pyspark.sql.functions as F

    from spark_kinesis_sql_asl_spark.llm.scoring import _TRUSTED_SOURCES
    from spark_kinesis_sql_asl_spark.tables import table

    w = QUERIES["q_llm_dsir_weight"](spark, SF_ORACLE)
    src = table(spark, SF_ORACLE, "documents").select("doc_id", "source")
    j = w.join(src, "doc_id").select(
        F.col("source").isin(*_TRUSTED_SOURCES).alias("t"), "logw_oct"
    )
    means = {
        r.t: r.m
        for r in j.groupBy("t").agg(F.avg("logw_oct").alias("m")).collect()
    }
    assert means[True] > means[False], means
