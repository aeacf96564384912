"""Exactly-once sink semantics: epoch-keyed idempotent writes make a
replayed micro-batch a no-op, and a checkpoint restart does not
duplicate rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.streaming.ingest import (
    IdempotentParquetSink,
    idempotent_fanout_query,
)
from mysql_public_data_ingestor_spark.topology import SinkTarget


def _stream(spark, sf_dir):
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )


def test_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    target = SinkTarget("db", "t")
    df = spark.range(100).select(F.col("id"))

    sink.write_batch(df, 7, target)
    first = spark.read.parquet(str(tmp_path / "out/db/t/epoch=7")).count()
    # replay the same epoch with DIFFERENT data: must be skipped
    sink.write_batch(spark.range(5).select(F.col("id")), 7, target)
    again = spark.read.parquet(str(tmp_path / "out/db/t/epoch=7")).count()
    assert first == again == 100


def test_checkpoint_restart_no_duplicates(spark, sf_dir, tmp_path):
    targets = [SinkTarget("db1", "t1"), SinkTarget("db2", "t1")]
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    ckpt = str(tmp_path / "ckpt")

    # run once to completion
    q = idempotent_fanout_query(_stream(spark, sf_dir), targets, sink, 1, ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    for t in targets:
        n = spark.read.parquet(str(tmp_path / "out" / t.database / t.table)).count()
        assert n == n_src

    # restart from the same checkpoint: no new epochs, no duplicates
    q2 = idempotent_fanout_query(_stream(spark, sf_dir), targets, sink, 1, ckpt).start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    for t in targets:
        n = spark.read.parquet(str(tmp_path / "out" / t.database / t.table)).count()
        assert n == n_src, "restart duplicated rows"
