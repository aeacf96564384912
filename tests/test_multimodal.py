"""Multimodal plumbing: binary columns through Arrow/mapInPandas."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.operators.multimodal import (
    _fake_decode_dims,
    decode_images,
    sample_frames,
)
from mysql_public_data_ingestor_spark.tables import Tables


def test_decode_images_schema_and_rows(spark, sf_dir):
    t = Tables(spark, sf_dir)
    df = t.documents.limit(20).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    out = decode_images(df)
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "channels",
    ]
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_bytes > 0
        assert r.channels == 3
        assert 64 <= r.width < 64 + 512
        assert 64 <= r.height < 64 + 512


def test_decode_deterministic(spark, sf_dir):
    t = Tables(spark, sf_dir)
    df = t.documents.limit(5).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    a = {r.doc_id: (r.width, r.height) for r in decode_images(df).collect()}
    b = {r.doc_id: (r.width, r.height) for r in decode_images(df).collect()}
    assert a == b


def test_sample_frames_fanout(spark, sf_dir):
    t = Tables(spark, sf_dir)
    df = t.documents.limit(10).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    frames = sample_frames(df, "payload", every_n_bytes=100).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    src = {r.doc_id: r.n for r in df.select("doc_id", F.octet_length("payload").alias("n")).collect()}
    for doc_id, rs in by_doc.items():
        expect = (src[doc_id] + 99) // 100
        assert len(rs) == expect
        assert sorted(x.frame_offset for x in rs) == [i * 100 for i in range(expect)]


def test_resize_composes_with_decode(spark, sf_dir):
    t = Tables(spark, sf_dir)
    from mysql_public_data_ingestor_spark.operators.multimodal import resize_images

    df = t.documents.limit(10).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    # chained mapInPandas stages, one plan, no materialization between
    resized = resize_images(decode_images(df).withColumnRenamed("n_bytes", "payload"))
    rows = resized.collect()
    assert len(rows) == 10
    for r in rows:
        assert (r.width, r.height) == (224, 224)
        assert 0 < r.scale_x <= 224 / 64 and 0 < r.scale_y <= 224 / 64


def test_extract_features_deterministic_shape(spark, sf_dir):
    from mysql_public_data_ingestor_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    t = Tables(spark, sf_dir)
    df = t.documents.limit(10).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    a = {r.doc_id: r.features for r in extract_features(df).collect()}
    b = {r.doc_id: r.features for r in extract_features(df).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    # histogram-rate components sum to ~1
    for v in a.values():
        assert abs(sum(v[2:6]) - 1.0) < 1e-9


def test_decode_real_mode_gated(spark, sf_dir):
    """mode='real' raises without PIL; mode='auto' falls back to the
    deterministic fake so the registered query is library-independent.
    With PIL installed, 'real' decodes a valid PNG and NULLs bad bytes."""
    import mysql_public_data_ingestor_spark.operators.multimodal as mm
    from mysql_public_data_ingestor_spark.tables import load_table

    df = (
        load_table(spark, sf_dir, "documents")
        .limit(4)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )
    if not mm.DECODE_AVAILABLE:
        with pytest.raises(NotImplementedError):
            decode_images(df, mode="real")
        auto = decode_images(df, mode="auto").collect()
        fake = decode_images(df, mode="fake").collect()
        assert {r.doc_id: (r.width, r.height) for r in auto} == {
            r.doc_id: (r.width, r.height) for r in fake
        }
    else:  # pragma: no cover - PIL not in this container
        out = {r.doc_id: r.width for r in decode_images(df, mode="real").collect()}
        assert all(w is None for w in out.values())  # text bytes aren't images


def test_registered_frame_sample_excludes_empty_and_matches_stride(spark, sf_dir):
    """The registered frame-sample query: per-doc fanout is
    ceil(bytes/stride), and a zero-byte payload yields no rows."""
    from mysql_public_data_ingestor_spark.operators.multimodal import (
        FRAME_STRIDE,
        multimodal_frame_sample,
    )

    frames = multimodal_frame_sample(spark, sf_dir).collect()
    t = Tables(spark, sf_dir)
    sizes = {
        r.doc_id: r.n
        for r in t.documents.select(
            "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n")
        ).collect()
    }
    by_doc: dict[int, int] = {}
    for r in frames:
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0) + 1
    for doc_id, n in sizes.items():
        assert by_doc.get(doc_id, 0) == (n + FRAME_STRIDE - 1) // FRAME_STRIDE


def test_registered_feature_stats_exact_ints(spark, sf_dir):
    """Feature stats are exact integer sufficient statistics: verify
    one doc against a pure-Python recomputation, and hist bins
    partition n_bytes."""
    from mysql_public_data_ingestor_spark.operators.multimodal import (
        multimodal_feature_stats,
    )

    rows = multimodal_feature_stats(spark, sf_dir).collect()
    t = Tables(spark, sf_dir)
    texts = dict(t.documents.select("doc_id", "text").limit(5).collect())
    for r in rows:
        assert r.hist0 + r.hist1 + r.hist2 + r.hist3 == r.n_bytes
        if r.doc_id in texts:
            b = texts[r.doc_id].encode("utf-8")
            assert r.byte_sum == sum(b)
            assert r.byte_sumsq == sum(x * x for x in b)
            assert r.byte_min == (min(b) if b else None)
