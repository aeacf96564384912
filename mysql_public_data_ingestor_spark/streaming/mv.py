"""Streaming materialized-view maintenance via ``foreachBatch``.

The streaming twin of the batch MV merges (`operators/advanced.py`:
``mv_incremental_agg_merge`` / ``mv_incremental_join_merge``): each
micro-batch's partial-aggregate state merges into the stored MV, so
the view stays fresh at O(delta) cost while history is never
rescanned. MV versions are epoch-keyed directories (the same
idempotency discipline as ``IdempotentParquetSink``): a
checkpoint-replayed epoch finds its version already present and
becomes a no-op, so restarts cannot double-count a batch.

At scale the merge input is |groups| + |batch groups| rows — the MV
refresh never depends on history size; the stored state is one tiny
parquet per version, and old versions are droppable retention.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MV_KEY = "o_orderpriority"


def _mv_state(df: DataFrame) -> DataFrame:
    """Mergeable partial-aggregate state: (count, exact cents sum)."""
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    return df.groupBy(MV_KEY).agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum(cents).alias("cents")
    )


def latest_epoch(mv_path: str) -> int | None:
    versions = glob.glob(os.path.join(mv_path, "epoch=*"))
    return max((int(d.rsplit("=", 1)[1]) for d in versions), default=None)


def read_mv(spark, mv_path: str) -> DataFrame:
    """Current MV contents (latest committed version)."""
    epoch = latest_epoch(mv_path)
    if epoch is None:
        raise FileNotFoundError(f"no MV version under {mv_path}")
    return spark.read.parquet(os.path.join(mv_path, f"epoch={epoch}"))


def merge_epoch(batch_df: DataFrame, epoch_id: int, mv_path: str) -> None:
    """Fold one micro-batch into the MV (idempotent per epoch)."""
    prev = latest_epoch(mv_path)
    if prev is not None and prev >= epoch_id:
        return  # replayed epoch: already folded, no-op
    delta = _mv_state(batch_df)
    if prev is None:
        merged = delta
    else:
        old = batch_df.sparkSession.read.parquet(
            os.path.join(mv_path, f"epoch={prev}")
        )
        merged = (
            old.unionByName(delta)
            .groupBy(MV_KEY)
            .agg(F.sum("n_orders").alias("n_orders"), F.sum("cents").alias("cents"))
        )
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(mv_path, f"epoch={epoch_id}")
    )


def maintain_priority_mv(stream_orders: DataFrame, mv_path: str):
    """writeStream query keeping the per-priority order MV fresh."""
    return (
        stream_orders.writeStream.foreachBatch(
            lambda df, eid: merge_epoch(df, eid, mv_path)
        )
        .outputMode("update")
    )
