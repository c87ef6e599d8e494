"""Round-9 wave invariants (B167–B170, C148–C155, D16): behavior checks the
oracle hash-compare can't see — monotonicity, structural invariants, and
composition identities."""

from __future__ import annotations

import math

from spark_kinesis_sql_asl_spark.registry import all_queries

from .conftest import SF_ORACLE

QUERIES = all_queries()


def test_probe_curve_monotone_and_saturating(spark):
    rows = {
        r.radius: r
        for r in QUERIES["q_llm_probe_curve"](spark, SF_ORACLE).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for r in range(1, 5):
        assert rows[r].n_candidates >= rows[r - 1].n_candidates
        assert rows[r].n_hit >= rows[r - 1].n_hit
    # the radius the C5 query ships with must clear its own recall gate
    assert rows[4].recall >= 0.9, rows[4]
    assert all(r.n_hit <= r.n_candidates for r in rows.values())


def test_contrastive_triples_are_valid(spark):
    rows = QUERIES["q_llm_contrastive_pairs"](spark, SF_ORACLE).collect()
    assert rows, "no triples — dup injection missing?"
    anchors = set()
    for r in rows:
        assert r.anchor_id < r.positive_id
        assert r.negative_id not in (r.anchor_id, r.positive_id)
        assert r.anchor_id not in anchors, "duplicate anchor"
        anchors.add(r.anchor_id)
    # every injected dup group (doc_id % 10 == 0 copies) yields one triple
    import duckdb

    con = duckdb.connect()
    n_groups = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF_ORACLE}/documents.parquet')"
        " WHERE doc_id % 10 = 0 AND text IS NOT NULL AND lang IS NOT NULL"
    ).fetchone()[0]
    # groups can merge if two injected sources share identical text
    assert len(rows) <= n_groups
    assert len(rows) >= n_groups * 0.9


def test_curriculum_phases_partition_the_corpus(spark):
    rows = QUERIES["q_llm_curriculum_bins"](spark, SF_ORACLE).collect()
    assert [r.phase for r in rows] == [1, 2, 3]
    total = sum(r.n_docs for r in rows)
    import duckdb

    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF_ORACLE}/documents.parquet')"
        " WHERE text IS NOT NULL AND lang IS NOT NULL"
    ).fetchone()[0]
    assert total == n_docs
    # value-granular tertile boundaries: each phase holds a real share
    assert all(r.n_docs >= 0.1 * n_docs for r in rows), rows
    # score ranges are disjoint and ordered
    assert rows[0].max_score <= rows[1].min_score
    assert rows[1].max_score <= rows[2].min_score


def test_cluster_reweight_cap_consistency(spark):
    rows = QUERIES["q_llm_cluster_reweight"](spark, SF_ORACLE).collect()
    assert len(rows) == 16
    n = sum(r.n_vecs for r in rows)
    for r in rows:
        assert r.weight_ppm >= 1
        if r.capped:
            assert r.weight_ppm == 10_000_000
        else:
            # floor(1e6 * N / (16 * n_cell)) exactly
            assert r.weight_ppm == (1_000_000 * n) // (16 * r.n_vecs)


def test_dup_two_hop_excludes_direct_edges(spark):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q_llm_dedup_jaccard"](spark, SF_ORACLE).collect()
    }
    rows = QUERIES["q_llm_dup_two_hop"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.doc_x < r.doc_z
        assert (r.doc_x, r.doc_z) not in pairs
        assert r.n_common >= 1


def test_cdc_counts_reconcile(spark):
    rows = QUERIES["q_llm_ingest_cdc"](spark, SF_ORACLE).collect()
    import duckdb

    con = duckdb.connect()
    per_lang = dict(
        con.execute(
            "SELECT lang, count(*) FROM"
            f" read_parquet('{SF_ORACLE}/documents.parquet') GROUP BY lang"
        ).fetchall()
    )
    per_lang_del = dict(
        con.execute(
            "SELECT lang, count(*) FROM"
            f" read_parquet('{SF_ORACLE}/documents.parquet')"
            " WHERE doc_id % 13 = 0 GROUP BY lang"
        ).fetchall()
    )
    for r in rows:
        assert r.n_live + r.n_deleted == per_lang[r.lang]
        assert r.n_deleted == per_lang_del.get(r.lang, 0)
        assert r.live_chars > 0 and r.live_checksum > 0


def test_js_divergence_bounded(spark):
    rows = QUERIES["q_llm_js_divergence"](spark, SF_ORACLE).collect()
    assert len(rows) == 10  # C(5 langs, 2)
    for r in rows:
        assert r.lang_a < r.lang_b
        assert 0.0 <= r.js_nats <= math.log(2) + 1e-6, r


def test_compress_proxy_deciles(spark):
    rows = QUERIES["q_llm_compress_proxy"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.decile <= 9
        assert r.repeated_bigrams >= 0


def test_lift_matrix_shape(spark):
    rows = QUERIES["q_events_lift_matrix"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_ab >= 1 and r.lift > 0


def test_path_prefix_ranked(spark):
    rows = QUERIES["q_events_path_prefix"](spark, SF_ORACLE).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.path.count(">") <= 2 for r in rows)


def test_seasonal_outliers_ranked_by_abs_residual(spark):
    rows = QUERIES["q_ts_seasonal_outliers"](spark, SF_ORACLE).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    resid = [abs(r.residual_cents) for r in rows]
    assert resid == sorted(resid, reverse=True)
    assert all(0 <= r.wd <= 6 for r in rows)


def test_grouping_id_rollup_shape(spark):
    rows = QUERIES["q_agg_grouping_id"](spark, SF_ORACLE).collect()
    grand = [r for r in rows if r.g_rf == 1 and r.g_ls == 1]
    assert len(grand) == 1
    assert grand[0].n == sum(
        r.n for r in rows if r.g_rf == 0 and r.g_ls == 0
    )
    # rollup: no row aggregates over returnflag while keeping linestatus
    assert not [r for r in rows if r.g_rf == 1 and r.g_ls == 0]


def test_split_leakage_matrix_complete(spark):
    rows = QUERIES["q_llm_split_leakage"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.split_lo <= r.split_hi
        assert r.is_leak == (1 if r.split_lo != r.split_hi else 0)
    # pair mass reconciles with the exact pair frame
    n_pairs = QUERIES["q_llm_dedup_jaccard"](spark, SF_ORACLE).count()
    assert sum(r.n_pairs for r in rows) == n_pairs


def test_quality_dup_matrix_partitions_corpus(spark):
    rows = QUERIES["q_llm_quality_dup_matrix"](spark, SF_ORACLE).collect()
    bands = {r.dup_band for r in rows}
    assert bands <= {"0", "1", "2-4", "5+"}
    total_ppm = sum(r.share_ppm for r in rows)
    assert 999_990 <= total_ppm <= 1_000_000  # floor-ppm rounding slack
    import duckdb

    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF_ORACLE}/documents.parquet')"
        " WHERE text IS NOT NULL"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs


def test_copurchase_jaccard_bounds(spark):
    rows = QUERIES["q_graph_copurchase"](spark, SF_ORACLE).collect()
    assert rows
    jac = [r.jaccard_ppm for r in rows]
    assert jac == sorted(jac, reverse=True)
    for r in rows:
        assert r.supp_a < r.supp_b
        assert 0 < r.jaccard_ppm <= 1_000_000
        assert r.n_shared >= 2


def test_order_concurrency_positive_and_ranked(spark):
    rows = QUERIES["q_win_order_concurrency"](spark, SF_ORACLE).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    opens = [r.open_orders for r in rows]
    assert opens == sorted(opens, reverse=True)
    assert all(r.open_orders > 0 for r in rows)
