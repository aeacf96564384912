"""Edge cases of the text-normalization column helpers — chiefly the
short-document shingle guard (ADVICE round 1: sequence(1, 0) defaults
to step -1 and yields [1, 0], so unguarded slice(tokens, 0, k) threw
for docs with fewer than k tokens while the DuckDB oracle returned []).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.functions.textnorm import (
    whitespace_tokens,
    word_shingles,
)

DOCS = [
    (0, ""),                        # empty
    (1, "one"),                     # 1 token < k
    (2, "two words"),               # k-1 tokens
    (3, "exactly three tokens"),    # exactly k
    (4, "a b c d e"),               # > k
    (5, "   padded   spaces   "),   # whitespace runs
]
K = 3


def _duck_shingles(text: str) -> list[str]:
    return duckdb.connect().execute(
        f"""
        WITH t AS (SELECT string_split(trim(regexp_replace(lower(?), '\\s+', ' ', 'g')), ' ') AS w)
        SELECT CASE WHEN len(w) >= {K}
                    THEN list_transform(range(1, len(w) - {K - 1} + 1),
                                        i -> array_to_string(w[i:i+{K - 1}], ' '))
                    ELSE [] END
        FROM t
        """,
        [text],
    ).fetchone()[0]


def test_short_docs_yield_empty_shingles_not_crash(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        "doc_id", word_shingles(whitespace_tokens(F.col("text")), K).alias("sh")
    )
    got = {r.doc_id: r.sh for r in df.collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _duck_shingles(text), (doc_id, text, got[doc_id])
    assert got[1] == [] and got[2] == []
    assert got[3] == ["exactly three tokens"]
    assert got[4] == ["a b c", "b c d", "c d e"]


def test_winnow_fingerprint_survives_short_docs(spark, tmp_path):
    """text_winnow_fingerprint over a corpus containing sub-k docs must
    not throw (it filters them out after the guarded gram stage)."""
    import shutil

    from mysql_public_data_ingestor_spark.registry import all_queries

    src = "/root/testdata/sf0.001"
    dst = tmp_path / "sf"
    dst.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", dst / f"{t}.parquet")
    docs = spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "docs_tmp"))
    import glob as _g
    shutil.copy(_g.glob(str(tmp_path / "docs_tmp/part-*.parquet"))[0],
                dst / "documents.parquet")
    out = all_queries()["text_winnow_fingerprint"].fn(spark, str(dst)).collect()
    assert out == []  # every doc is shorter than the winnow window
