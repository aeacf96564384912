"""Semantic tests for the corpus-management operators (sampling,
splits, vocabulary, entropy, passage dedup, centroid QC) beyond the
oracle-parity gate: determinism, partitioning invariance, and edge
cases the fixture corpus doesn't exercise."""

from __future__ import annotations

import os

import pytest

from mysql_public_data_ingestor_spark.operators import corpus
from mysql_public_data_ingestor_spark.tables import Tables


def _write_documents(spark, tmp_path, rows):
    """Materialize a tiny documents table so operators can read it."""
    sf = str(tmp_path)
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_sample_is_deterministic_subset_of_split(spark, sf_dir):
    sample = {r.doc_id for r in corpus.sample_hash_mod(spark, sf_dir).collect()}
    again = {r.doc_id for r in corpus.sample_hash_mod(spark, sf_dir).collect()}
    assert sample == again
    # ~10% of the corpus, never wildly off (hash-uniformity sanity)
    total = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    assert 0.02 * total <= len(sample) <= 0.25 * total


def test_split_partitions_whole_corpus(spark, sf_dir):
    rows = {r.split: r for r in corpus.split_train_val_test(spark, sf_dir).collect()}
    assert set(rows) <= {"train", "val", "test"}
    total = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    assert sum(r.n_docs for r in rows.values()) == total
    # the 80% slice dominates
    assert rows["train"].n_docs > max(
        r.n_docs for k, r in rows.items() if k != "train"
    )


def test_split_stable_under_repartitioning(spark, sf_dir):
    """Hash-based assignment must not depend on physical layout."""
    base = {
        (r.split, r.n_docs)
        for r in corpus.split_train_val_test(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    shuffled = docs.repartition(13, "source")

    class FakeTables:
        documents = shuffled

    orig = corpus.Tables
    corpus.Tables = lambda *_: FakeTables()  # type: ignore[assignment]
    try:
        again = {
            (r.split, r.n_docs)
            for r in corpus.split_train_val_test(spark, sf_dir).collect()
        }
    finally:
        corpus.Tables = orig
    assert base == again


def test_token_entropy_extremes(spark, tmp_path):
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, "a a a a a a a a", "en", "t", 15),          # all-repeat: entropy 0
            (2, "a b c d e f g h", "en", "t", 15),          # uniform: entropy ln(8)
            (3, "x", "en", "t", 1),                          # single token: entropy 0
        ],
    )
    rows = {r.doc_id: r for r in corpus.text_token_entropy(spark, sf).collect()}
    assert rows[1].entropy == 0.0 and rows[1].gini_diversity == 0.0
    assert rows[3].entropy == 0.0 and rows[3].distinct_tokens == 1
    import math

    assert rows[2].entropy == pytest.approx(math.log(8), abs=1e-5)
    assert rows[2].gini_diversity == pytest.approx(1 - 8 * (1 / 64), abs=1e-6)


def test_passage_windows_short_doc_and_dup_detection(spark, tmp_path):
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "t", 35),  # 2 windows
            (2, "alpha beta gamma other words here", "en", "t", 33),    # shares window 1
            (3, "un deux", "en", "t", 7),                               # < W tokens: no windows
        ],
    )
    rows = {r.doc_id: r for r in corpus.dedup_passage_windows(spark, sf).collect()}
    assert 3 not in rows  # short doc contributes no windows (and no crash)
    assert rows[1].n_chunks == 2 and rows[2].n_chunks == 2
    assert rows[1].dup_chunks == 1 and rows[2].dup_chunks == 1
    assert rows[1].dup_ratio == pytest.approx(0.5)


def test_centroid_outliers_shape_and_bounds(spark, sf_dir):
    rows = corpus.embedding_centroid_outliers(spark, sf_dir).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
        assert -1.0 - 1e-6 <= r.cos_centroid <= 1.0 + 1e-6
    for label, members in by_label.items():
        assert len(members) <= corpus.OUTLIER_K
        ranks = sorted(m.rnk for m in members)
        assert ranks == list(range(1, len(members) + 1))
        ordered = sorted(members, key=lambda m: (m.cos_centroid, m.vec_id))
        assert [m.rnk for m in ordered] == ranks


def test_dim_stats_cover_every_dimension(spark, sf_dir):
    rows = corpus.embedding_dim_stats(spark, sf_dir).collect()
    assert {r.pos for r in rows} == set(range(1, 65))
    assert all(r.var_v >= 0 for r in rows)


def test_decontamination_flags_planted_overlap(spark, tmp_path):
    """doc_ids 0,2 hash into train buckets, 1 into val; doc 0 shares a
    4-gram with val doc 1, doc 2 shares nothing."""
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (0, "alpha beta gamma delta unrelated tail words", "en", "t", 40),
            (1, "prefix alpha beta gamma delta suffix", "en", "t", 36),   # val
            (2, "totally different content with no overlap at all", "en", "t", 48),
        ],
    )
    rows = {r.doc_id: r for r in corpus.corpus_decontaminate_ngram_overlap(spark, sf).collect()}
    assert 0 in rows and 2 not in rows
    assert rows[0].n_shared_grams == 1 and rows[0].n_val_docs == 1
    assert rows[0].overlap_ratio == pytest.approx(1 / rows[0].n_grams)


def test_pack_sequences_conserves_and_bounds(spark, sf_dir):
    import os as _os

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    packed = corpus.corpus_pack_sequences(spark, sf_dir).collect()
    assert sum(r.n_docs for r in packed) == docs.count()
    # each sequence starts where the previous ended: per source, seq_ids
    # are dense from 0 and doc ranges never interleave
    by_source: dict[str, list] = {}
    for r in packed:
        by_source.setdefault(r.source, []).append(r)
    for source, seqs in by_source.items():
        seqs.sort(key=lambda r: r.seq_id)
        assert seqs[0].seq_id == 0
        for prev, cur in zip(seqs, seqs[1:]):
            assert prev.last_doc < cur.first_doc
        # a sequence (except possibly the last) spans >= the budget once
        # its successor exists: its start offset is seq_id * budget
        assert all(r.seq_tokens > 0 for r in seqs)


def test_bigram_transitions_planted_probabilities(spark, tmp_path):
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, "a b a b a c", "en", "t", 11),
            (2, "a b", "en", "t", 3),
            (3, "solo", "en", "t", 4),  # single token: no bigrams
        ],
    )
    rows = corpus.text_bigram_transitions(spark, sf).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_token, {})[r.next_token] = r
    # "a" -> b 3 times, c once (tot 4); "solo" emits nothing
    assert by_prev["a"]["b"].cnt == 3 and by_prev["a"]["b"].tot == 4
    assert by_prev["a"]["b"].prob == pytest.approx(0.75)
    assert by_prev["a"]["b"].rnk == 1 and by_prev["a"]["c"].rnk == 2
    assert "solo" not in by_prev


def test_hll_union_estimates_near_exact(spark, sf_dir):
    from mysql_public_data_ingestor_spark.tables import Tables
    from pyspark.sql import functions as F

    est = {r.event_type: r for r in corpus.events_hll_daily_union(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.exact
        for r in Tables(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, r in est.items():
        assert abs(r.est_unique_users - exact[et]) <= max(0.05 * exact[et], 2)
        # union estimate never exceeds the sum of daily estimates
        assert r.est_unique_users <= r.sum_daily_estimates * 1.01


def test_mixture_weights_balance(spark, sf_dir):
    rows = {r.lang: r for r in corpus.corpus_mixture_weights(spark, sf_dir).collect()}
    assert sum(r.actual_share for r in rows.values()) == pytest.approx(1.0, abs=1e-4)
    for r in rows.values():
        # weight * actual share recovers the target share
        assert r.sample_weight * r.actual_share == pytest.approx(
            r.target_share, rel=1e-3
        )
    # dominant language (en) must be downsampled, rare ones upsampled
    assert rows["en"].sample_weight < 1.0


def test_incremental_dedup_planted_duplicate(spark, tmp_path):
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, "identical corpus content here", "en", "src5", 29),   # base
            (2, "identical corpus content here", "en", "src0", 29),   # new dup
            (3, "fresh unseen content", "en", "src0", 20),            # new unique
            (4, "base only content", "en", "src7", 17),               # base
        ],
    )
    rows = {r.doc_id: r for r in corpus.dedup_incremental_new_docs(spark, sf).collect()}
    assert set(rows) == {2, 3}  # only the incoming batch is decided
    assert rows[2].decision == "drop_exact"
    assert rows[3].decision == "keep"


def test_stats_pack_sanity(spark, sf_dir):
    from mysql_public_data_ingestor_spark.operators import stats

    corr = stats.stats_corr_price_quantity(spark, sf_dir).collect()
    for r in corr:
        assert -1.0 <= r.corr_qty_price <= 1.0
    chi = stats.stats_chi_square_lang_source(spark, sf_dir).collect()
    assert all(r.chi2_contrib >= 0 for r in chi)
    hist = stats.agg_histogram_order_totals(spark, sf_dir).collect()
    import os as _os

    n_orders = spark.read.parquet(_os.path.join(sf_dir, "orders.parquet")).count()
    assert sum(r.n_orders for r in hist) == n_orders
    for r in hist:
        assert r.bucket_lo == r.bucket * stats.HIST_WIDTH


def test_events_ts_parity_survives_non_utc_session(spark, sf_dir):
    """The loader pins session tz to UTC before normalizing ts, so a
    driver session started in any timezone sees DuckDB-identical naive
    timestamps (regression guard for the NTZ->LTZ cast path)."""
    import duckdb

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        t = Tables(spark, sf_dir)
        got = t.events.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
        want = duckdb.sql(
            f"SELECT min(ts), max(ts) FROM read_parquet('{sf_dir}/events.parquet')"
        ).fetchone()
        assert str(got.lo) == str(want[0])
        assert str(got.hi) == str(want[1])
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
