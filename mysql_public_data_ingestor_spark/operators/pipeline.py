"""Composed training-data pipeline: the end-to-end LLM-data-prep shape
as ONE declarative plan — quality filter -> exact dedup (keep min
doc_id) -> per-language token accounting.

This is the composition the individual operators exist for; because it
is a single DataFrame plan, Catalyst fuses the stages (the quality
filter prunes before the dedup shuffle; the dedup winner join is a
broadcast) instead of materializing intermediates between "steps".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import normalized_text, sha256_hex, whitespace_tokens
from ..registry import register
from ..tables import Tables

MIN_WORDS = 20
MAX_STOP_RATIO = 0.6
STOPWORDS = ("the", "a", "of", "and", "in")


@register(
    "pipeline_training_data_prep",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
             len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS n_words,
             len(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                             w -> w IN ({', '.join(f"'{w}'" for w in STOPWORDS)}))) AS n_stop
      FROM documents
    ), quality AS (
      SELECT * FROM scored
      WHERE n_words >= {MIN_WORDS} AND n_stop * 1.0 / n_words <= {MAX_STOP_RATIO}
    ), keep AS (
      SELECT content_hash, min(doc_id) AS keep_doc_id FROM quality GROUP BY content_hash
    )
    SELECT q.lang,
           count(*)                                       AS n_docs,
           CAST(sum(q.n_words) AS BIGINT)                 AS total_tokens,
           round(avg(q.n_words), 4)                       AS avg_tokens,
           min(q.doc_id)                                  AS min_doc_id
    FROM quality q JOIN keep k
      ON q.content_hash = k.content_hash AND q.doc_id = k.keep_doc_id
    GROUP BY q.lang
    """,
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate -> dedup -> token-accounting pipeline (one plan).

    Stages (all fused by Catalyst, no intermediate materialization):
      1. score: normalized tokens, stopword counts;
      2. quality gate: >= MIN_WORDS words, stopword ratio <= cap;
      3. exact dedup on the normalized-content hash, keeping min doc_id
         (deterministic winner);
      4. per-language corpus accounting of the surviving documents.
    """
    t = Tables(spark, sf_dir)
    words = whitespace_tokens(F.col("text"))
    scored = t.documents.select(
        "doc_id",
        "lang",
        sha256_hex(normalized_text(F.col("text"))).alias("content_hash"),
        F.size(words).alias("n_words"),
        F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).alias("n_stop"),
    )
    quality = scored.filter(
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_stop") / F.col("n_words") <= MAX_STOP_RATIO)
    )
    # `keep` derives from `quality`, so the join columns are renamed first:
    # joining on quality["content_hash"] == keep["content_hash"] would hit
    # Spark's ambiguous self-join resolution (trivially-true predicate).
    keep = (
        quality.groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"))
        .withColumnRenamed("content_hash", "keep_hash")
    )
    survivors = quality.join(
        keep,
        (F.col("content_hash") == F.col("keep_hash"))
        & (F.col("doc_id") == F.col("keep_doc_id")),
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_tokens"),
        F.round(F.avg("n_words"), 4).alias("avg_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )
