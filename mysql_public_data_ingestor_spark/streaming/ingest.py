"""Micro-batch ingestion engine: poll source -> broadcast fan-out to N
sink targets.

Reference pipeline being re-expressed (SURVEY §3):
  - poll loop with interval + retry/backoff (main.go:101-127) ->
    Structured Streaming trigger(processingTime=interval) driving the
    source, plus bounded fetch retries inside the poller;
  - broadcast distribute: every batch to every (db, table) channel
    (main.go:129-158) -> ``foreachBatch`` writing the SAME persisted
    DataFrame to every sink target — ``persist()`` is mandatory: without
    it Spark recomputes (re-polls!) the source once per sink
    (SURVEY §4, the one semantic trap);
  - transactional insert per table (main.go:160-212) -> each sink write
    is per-partition transactional (JDBC) or atomic-rename (parquet);
  - bounded demo run (main.go:49-50) -> ``run(duration_s=...)``.

Backpressure is structural: micro-batch N+1 does not start until every
sink of batch N finished — the reference's unbounded fire-and-forget
goroutines (main.go:152-154) cannot pile up here.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..logging_util import get_logger
from ..sources.registry import SourcePlugin

SinkWriter = Callable[[DataFrame, "object"], None]

log = get_logger("ingest")


@dataclass
class ParquetSink:
    """Filesystem stand-in for the MySQL table sink (same fan-out
    semantics, atomically committed per micro-batch)."""

    path: str

    def __call__(self, df: DataFrame, target) -> None:
        df.write.mode("append").parquet(f"{self.path}/{target.database}/{target.table}")


@dataclass
class JdbcSink:
    cfg: "object"
    batch_size: int = 1000

    def __call__(self, df: DataFrame, target) -> None:
        from ..sources.jdbc import jdbc_append

        jdbc_append(df, self.cfg, target, self.batch_size).save()


@dataclass
class IngestEngine:
    """Drives plugin polls into a replicated fan-out of sink targets."""

    spark: SparkSession
    plugin: SourcePlugin
    targets: list
    sink: SinkWriter
    max_fetch_retries: int = 5
    retry_backoff_s: float = 5.0
    sleep: Callable[[float], None] = time.sleep
    batches_done: int = field(default=0, init=False)
    rows_done: int = field(default=0, init=False)

    def fetch_with_retry(self) -> list[tuple]:
        """reference: warn + 5 s sleep + retry on fetch error
        (main.go:111-122); bounded here so failures surface."""
        attempt = 0
        while True:
            try:
                return self.plugin.fetch_rows()
            except Exception as e:
                attempt += 1
                if attempt >= self.max_fetch_retries:
                    log.error("fetch failed after %d attempts: %s", attempt, e)
                    raise
                log.warning(
                    "fetch error (attempt %d/%d), retrying in %.1fs: %s",
                    attempt, self.max_fetch_retries, self.retry_backoff_s, e,
                )
                self.sleep(self.retry_backoff_s)

    def process_batch(self, rows: list[tuple]) -> int:
        """One micro-batch: rows -> DataFrame -> every sink target.

        An empty poll still counts as a completed batch (the loop's
        progress/bound accounting must advance or ``run(max_batches=N)``
        would spin forever on a quiet source)."""
        if not rows:
            self.batches_done += 1
            return 0
        # Arrow path: tuples -> pandas -> DataFrame is ~10x faster than
        # row-at-a-time Python serialization for wide snapshot batches
        import pandas as pd

        schema = self.plugin.schema()
        pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
        df = self.spark.createDataFrame(pdf, schema=schema)
        # mandatory: one materialization shared by all sinks (else the
        # source would be re-polled per sink — SURVEY §4 persist row).
        # Batch accounting rides the first sink write via observe()
        # instead of a separate count() action — one pass per batch,
        # not two; the first write populates the cache AND the metric.
        from pyspark.sql import Observation

        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for target in self.targets:
                self.sink(df, target)
            if not self.targets:
                # Observation.get blocks until an action runs over the
                # observed frame; with zero sinks no action ever fires
                # and obs.get would hang forever. Count directly (also
                # warms the persisted cache for any later reader).
                n = df.count()
            else:
                n = int(obs.get["n"])
        finally:
            df.unpersist()
        self.batches_done += 1
        self.rows_done += n
        log.info("batch %d: %d rows -> %d sinks", self.batches_done, n, len(self.targets))
        return n

    def run(self, duration_s: Optional[float] = None, max_batches: Optional[int] = None) -> None:
        """Poll loop with the plugin's interval (reference: main.go:101-127;
        bounded like the 60 s demo run, main.go:49-50)."""
        deadline = time.monotonic() + duration_s if duration_s else None
        while True:
            if max_batches is not None and self.batches_done >= max_batches:
                return
            if deadline is not None and time.monotonic() >= deadline:
                return
            self.process_batch(self.fetch_with_retry())
            interval = max(self.plugin.interval(), 0)
            if interval:
                self.sleep(interval)


def streaming_fanout_query(
    stream_df: DataFrame,
    targets: list,
    sink: SinkWriter,
    interval_s: int,
    checkpoint_dir: str,
):
    """Structured-Streaming variant: foreachBatch fan-out with persist.

    Use with any streaming source (the OpenSky DataSource, rate, files).
    """

    def write_all(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for target in targets:
                sink(batch_df, target)
        finally:
            batch_df.unpersist()

    return (
        stream_df.writeStream.foreachBatch(write_all)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{interval_s} seconds")
    )


@dataclass
class IdempotentParquetSink:
    """Exactly-once parquet sink for ``foreachBatch``: one directory per
    (target, epoch), skipped if already committed.

    ``foreachBatch`` is at-least-once — after a crash the same epoch
    replays. Keying the write by epoch id and skipping committed epochs
    makes the replay duplicate-free (the JDBC analog: an epoch column +
    `INSERT ... ON DUPLICATE KEY` / staging-table swap keyed by epoch).

    End-to-end exactly-once additionally requires the SOURCE to
    reproduce the replayed epoch's rows: pair with
    ``OpenSkyStreamReader``'s ``spool_dir`` option (polled rows spilled
    to disk before the offset is visible). Without a spool the source
    replays an in-flight epoch as empty — duplicate-free but
    at-most-once for that poll window.
    """

    path: str

    def write_batch(self, df: DataFrame, epoch_id: int, target) -> None:
        out = f"{self.path}/{target.database}/{target.table}/epoch={epoch_id}"
        marker = f"{out}/_SUCCESS"
        jvm_path = df.sparkSession._jvm.org.apache.hadoop.fs.Path(marker)  # type: ignore[union-attr]
        fs = jvm_path.getFileSystem(
            df.sparkSession._jsc.hadoopConfiguration()  # type: ignore[union-attr]
        )
        if fs.exists(jvm_path):
            return  # epoch already committed -> replay is a no-op
        df.write.mode("overwrite").parquet(out)


def idempotent_fanout_query(
    stream_df: DataFrame,
    targets: list,
    sink: IdempotentParquetSink,
    interval_s: int,
    checkpoint_dir: str,
):
    """Streaming fan-out with exactly-once sink semantics."""

    def write_all(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for target in targets:
                sink.write_batch(batch_df, epoch_id, target)
        finally:
            batch_df.unpersist()

    return (
        stream_df.writeStream.foreachBatch(write_all)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{interval_s} seconds")
    )
