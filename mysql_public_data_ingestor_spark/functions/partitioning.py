"""Partition sizing for CPU-heavy (Arrow/Python) stages.

Bytes-based partitioning (``spark.sql.files.maxPartitionBytes``, AQE
coalescing) under-parallelizes stages whose cost is per-row CPU, not
bytes — a 5 MB corpus of 5k documents is one "byte-sized" partition but
minutes of shingling. Conversely, hash-repartitioning a small input to
``defaultParallelism`` spins up one Python worker per (nearly empty)
partition, and the per-worker startup dominates the stage.

``cpu_repartition`` sizes by ROWS per task: partitions grow linearly
with the data (100x corpus -> 100x tasks) until the cap — a few waves
per core — keeps task counts sane on any cluster. The row count comes
from parquet metadata (no data scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_ROWS_PER_TASK = 1000
WAVES_PER_CORE = 4


def cpu_repartition(
    df: DataFrame,
    key: str,
    rows_per_task: int = DEFAULT_ROWS_PER_TASK,
) -> DataFrame:
    """Hash-repartition ``df`` on ``key`` with a partition count sized
    for a per-row-CPU-heavy downstream stage (Pandas UDF / mapInPandas).
    """
    sc = df.sparkSession.sparkContext
    n_rows = df.count()  # parquet scans answer this from footer metadata
    cap = max(sc.defaultParallelism * WAVES_PER_CORE, 1)
    n_parts = max(1, min(cap, (n_rows + rows_per_task - 1) // rows_per_task))
    return df.repartition(n_parts, key)
