"""Ingest engine tests: fan-out distribution, retry, schema-driven
synthetic records (mirrors main_test.go TestFetchAndDistributeData /
TestTableWorker and the disabled integration test's generateMockData,
FIXTURES.md A2/A3)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import types as T

from mysql_public_data_ingestor_spark.config import DatabasesConfig, ExtraDatabase
from mysql_public_data_ingestor_spark.schema import FLIGHTS_SCHEMA, schema_from_mysql_map
from mysql_public_data_ingestor_spark.sources.opensky import OpenSkyPlugin
from mysql_public_data_ingestor_spark.streaming.ingest import IngestEngine, ParquetSink
from mysql_public_data_ingestor_spark.topology import expand_topology


def generate_mock_row(schema: T.StructType) -> tuple:
    """Schema-driven synthetic record, the engine twin of
    generateMockData (main_integration_test.go.disabled:67-90):
    INT->123456, VARCHAR->'test', FLOAT->1.23, BOOLEAN->True, JSON->'{}'."""
    out = []
    for f in schema.fields:
        if isinstance(f.dataType, (T.IntegerType, T.LongType)):
            out.append(123456)
        elif isinstance(f.dataType, T.DoubleType):
            out.append(1.23)
        elif isinstance(f.dataType, T.BooleanType):
            out.append(True)
        else:
            out.append("test" if f.name != "sensors" else "{}")
    return tuple(out)


class FlakyPlugin(OpenSkyPlugin):
    """Fails n times then returns a fixed batch."""

    def __init__(self, fail_times: int, rows: list[tuple]):
        super().__init__(http_get=lambda url, auth: b"")
        self.fail_times = fail_times
        self.rows = rows
        self.calls = 0

    def fetch_rows(self) -> list[tuple]:
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("boom")
        return self.rows


@pytest.fixture()
def topology_cfg():
    return DatabasesConfig(
        prefix="test_prefix",
        table_prefix="data",
        copies=2,
        extra={"extra1": ExtraDatabase(tables=2)},
    )


def test_fanout_every_target_gets_every_batch(spark, tmp_path, topology_cfg):
    # TestFetchAndDistributeData semantics: one batch -> all channels
    rows = [generate_mock_row(FLIGHTS_SCHEMA) for _ in range(10)]
    plugin = FlakyPlugin(0, rows)
    targets = expand_topology(topology_cfg)
    sink = ParquetSink(str(tmp_path))
    eng = IngestEngine(spark=spark, plugin=plugin, targets=targets, sink=sink, sleep=lambda s: None)
    eng.run(max_batches=2)

    assert eng.batches_done == 2
    assert eng.rows_done == 20
    for t in targets:
        df = spark.read.parquet(str(tmp_path / t.database / t.table))
        assert df.count() == 20                      # both batches, replicated
        assert [f.name for f in df.schema.fields] == [f.name for f in FLIGHTS_SCHEMA.fields]
        row = df.limit(1).collect()[0]
        assert row.time == 123456 and row.on_ground is True


def test_fetch_retry_then_success(spark, tmp_path, topology_cfg):
    slept = []
    rows = [generate_mock_row(FLIGHTS_SCHEMA)]
    plugin = FlakyPlugin(3, rows)
    eng = IngestEngine(
        spark=spark,
        plugin=plugin,
        targets=expand_topology(topology_cfg)[:1],
        sink=ParquetSink(str(tmp_path)),
        retry_backoff_s=5.0,
        sleep=slept.append,
    )
    eng.run(max_batches=1)
    assert plugin.calls == 4
    assert slept[:3] == [5.0, 5.0, 5.0]   # the reference's 5 s backoff


def test_fetch_retry_exhaustion_raises(spark, topology_cfg):
    plugin = FlakyPlugin(99, [])
    eng = IngestEngine(
        spark=spark,
        plugin=plugin,
        targets=[],
        sink=lambda df, t: None,
        max_fetch_retries=3,
        sleep=lambda s: None,
    )
    with pytest.raises(ConnectionError):
        eng.fetch_with_retry()
    assert plugin.calls == 3


def test_empty_batch_skips_sinks(spark, topology_cfg):
    writes = []
    plugin = FlakyPlugin(0, [])
    eng = IngestEngine(
        spark=spark,
        plugin=plugin,
        targets=expand_topology(topology_cfg),
        sink=lambda df, t: writes.append(t),
        sleep=lambda s: None,
    )
    eng.run(max_batches=1)
    assert writes == []
    assert eng.rows_done == 0


def test_sink_contract_values(spark, tmp_path):
    # FIXTURES.md A3: field1 int, field2 varchar; row (1, "value") must
    # arrive at the named db.table exactly once
    schema = schema_from_mysql_map([("field1", "INT"), ("field2", "VARCHAR(50)")])

    class OneShot(OpenSkyPlugin):
        def fetch_rows(self):
            return [(1, "value")]

        def schema(self):  # type: ignore[override]
            return schema

    from mysql_public_data_ingestor_spark.topology import SinkTarget

    eng = IngestEngine(
        spark=spark,
        plugin=OneShot(http_get=lambda u, a: b""),
        targets=[SinkTarget("test_db", "test_table")],
        sink=ParquetSink(str(tmp_path)),
        sleep=lambda s: None,
    )
    eng.run(max_batches=1)
    got = spark.read.parquet(str(tmp_path / "test_db" / "test_table")).collect()
    assert [(r.field1, r.field2) for r in got] == [(1, "value")]
