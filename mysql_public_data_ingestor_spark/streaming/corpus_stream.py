"""Streaming corpus ingestion: incremental dedup of a document stream.

The streaming twin of ``operators/corpus.dedup_incremental_new_docs``:
documents arrive as a stream, are content-hashed, deduplicated
first-wins within the stream (stateful ``dropDuplicates`` /
``dropDuplicatesWithinWatermark``), and anti-joined against the static
already-ingested corpus's hash set — so only genuinely new content
reaches the sink. This is the steady-state 100 TB ingestion shape: the
base corpus is never re-scanned per batch (it's a static relation the
stream probes), and state holds 60-bit hashes, not text.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textnorm import normalized_text, sha256_prefix_i64


def incremental_dedup_stream(
    stream_docs: DataFrame,
    base_hashes: DataFrame,
    *,
    watermark: Optional[tuple[str, str]] = None,
) -> DataFrame:
    """Keep-list stream: new-content documents only.

    ``stream_docs``: streaming DataFrame with a ``text`` column.
    ``base_hashes``: static DataFrame with a ``content_hash`` int64
    column (the already-ingested corpus's normalized-text hashes).
    ``watermark``: optional ``(event_time_col, delay)`` — when set, the
    within-stream dedup uses ``dropDuplicatesWithinWatermark`` so state
    is bounded by the watermark horizon instead of growing forever
    (the production setting; unbounded state is only acceptable for
    bounded backfills).

    The anti join is stream-static: each micro-batch probes the base
    relation without re-reading it into state.
    """
    hashed = stream_docs.withColumn(
        "content_hash", sha256_prefix_i64(normalized_text(F.col("text")))
    )
    if watermark is not None:
        col, delay = watermark
        deduped = hashed.withWatermark(col, delay).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    else:
        deduped = hashed.dropDuplicates(["content_hash"])
    return deduped.join(
        base_hashes.select("content_hash"), "content_hash", "left_anti"
    )


def base_hashes_from_documents(documents: DataFrame) -> DataFrame:
    """Distinct normalized-content hashes of an ingested corpus.

    At scale this is materialized once (bucketed by hash) and reused by
    every ingestion stream; here it derives on the fly.
    """
    return (
        documents.select(
            sha256_prefix_i64(normalized_text(F.col("text"))).alias("content_hash")
        ).distinct()
    )
