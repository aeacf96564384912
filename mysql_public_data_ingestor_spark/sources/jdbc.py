"""JDBC source/sink helpers (the north-star "MySQL ingestion -> Spark
DataFrame ETL" direction plus the reference's insert sink).

Reference mapping:
  - transactional row-insert sink with per-table workers
    (main.go:160-212) -> ``jdbc_append`` — Spark's JDBC writer batches
    inserts per partition inside a transaction (partition-level
    atomicity, strictly stronger than the reference's broken
    commit-per-record loop, SURVEY §2.A);
  - connection pool knobs (database/db_manager.go:37-58) ->
    numPartitions / batchsize writer options (Spark opens a connection
    per partition task; there is no client pool to manage);
  - TLS DSN params (database/db_manager.go:60-113) -> JDBC URL params.

Scale notes: reads are *partitioned* (partitionColumn/lowerBound/
upperBound/numPartitions) so a 100 TB table scans in parallel with
predicate pushdown into MySQL; never read unpartitioned except for tiny
dims.

No MySQL server or JDBC driver jar ships in this container, so these
helpers only *build* readers/writers and option maps; tests assert the
option-building logic (the reference's sqlmock tests assert generated
SQL the same way, main_test.go:137-187).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..config import MySQLConfig
from ..topology import SinkTarget


@dataclass(frozen=True)
class PartitionSpec:
    """Partitioned-read bounds: lets Spark issue numPartitions parallel
    range queries instead of one giant scan."""

    column: str
    lower_bound: int
    upper_bound: int
    num_partitions: int


def jdbc_read_options(
    cfg: MySQLConfig,
    table: str,
    partition: Optional[PartitionSpec] = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    opts = {
        "url": cfg.jdbc_url(),
        "dbtable": table,
        "user": cfg.username,
        "password": cfg.password,
        "fetchsize": str(fetch_size),
        "driver": "com.mysql.cj.jdbc.Driver",
    }
    if partition is not None:
        opts.update(
            partitionColumn=partition.column,
            lowerBound=str(partition.lower_bound),
            upperBound=str(partition.upper_bound),
            numPartitions=str(partition.num_partitions),
        )
    return opts


def jdbc_write_options(
    cfg: MySQLConfig, target: SinkTarget, batch_size: int = 1000
) -> dict[str, str]:
    pool = cfg.pool.normalized()
    return {
        "url": cfg.jdbc_url(),
        "dbtable": target.qualified,
        "user": cfg.username,
        "password": cfg.password,
        "batchsize": str(batch_size),
        # write parallelism bounded by the pool's max_open_conns intent
        "numPartitions": str(pool.max_open_conns),
        "isolationLevel": "READ_COMMITTED",
        "driver": "com.mysql.cj.jdbc.Driver",
    }


def jdbc_reader(
    spark: SparkSession,
    cfg: MySQLConfig,
    table: str,
    partition: Optional[PartitionSpec] = None,
):
    return spark.read.format("jdbc").options(**jdbc_read_options(cfg, table, partition))


def jdbc_append(df: DataFrame, cfg: MySQLConfig, target: SinkTarget, batch_size: int = 1000):
    """Configured (not executed) JDBC append writer for one sink target."""
    return df.write.format("jdbc").options(**jdbc_write_options(cfg, target, batch_size)).mode(
        "append"
    )
