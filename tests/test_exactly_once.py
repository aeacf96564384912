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


def test_spooled_source_crash_replay_end_to_end(spark, tmp_path):
    """End-to-end exactly-once: the OpenSky stream with spool_dir,
    crashed AFTER the offset was planned but BEFORE the epoch was
    written, must deliver the poll's rows exactly once after restart.

    Simulates the crash at the DataSource level (same reader classes
    the query engine drives): reader A plans an offset (spooling rows),
    'dies'; reader B (the restart) replays the epoch from the spool and
    the idempotent sink commits it exactly once; a second replay is a
    no-op.
    """
    import json as _json

    import mysql_public_data_ingestor_spark.sources.opensky as osky
    from mysql_public_data_ingestor_spark.schema import FLIGHTS_SCHEMA

    if not osky.DATASOURCE_AVAILABLE:
        import pytest

        pytest.skip("pyspark.sql.datasource missing")
    from mysql_public_data_ingestor_spark.sources.opensky import OpenSkyStreamReader

    state = [1234567890, "abc123", "CS", "X", 1234567890, 1234567890,
             1.0, 2.0, 3.0, False, 4.0, 5.0, 6.0, None, 7.0, "SQ", False, 0]
    payload = tmp_path / "snap.json"
    payload.write_text(_json.dumps({"time": 1, "states": [state] * 4}))
    opts = {"payload_file": str(payload), "spool_dir": str(tmp_path / "spool")}

    # reader A polls (offset visible, rows spooled), then "crashes"
    ra = OpenSkyStreamReader(opts)
    start, end = ra.initialOffset(), ra.latestOffset()

    # restart: reader B replays the epoch from the spool
    rb = OpenSkyStreamReader(opts)
    rows = [row for p in rb.partitions(start, end) for row in p.rows]
    df = spark.createDataFrame(rows, schema=FLIGHTS_SCHEMA)

    sink = IdempotentParquetSink(str(tmp_path / "out"))
    target = SinkTarget("db", "t")
    sink.write_batch(df, epoch_id=end["poll"], target=target)
    # at-least-once delivery: the same epoch arrives again -> no-op
    sink.write_batch(df, epoch_id=end["poll"], target=target)
    rb.commit(end)

    got = spark.read.parquet(str(tmp_path / "out/db/t/epoch=1"))
    assert got.count() == 4
    assert not list((tmp_path / "spool").glob("poll_*.json"))
