"""Live-MySQL acceptance drive for the JDBC path (run via spark-submit
with Connector/J on the classpath; see acceptance/README.md).

Asserts, against a real server, the behaviors the sandbox can only
contract-test: DDL bootstrap, transactional append fan-out, partitioned
read equivalence, and pool->numPartitions mapping.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from mysql_public_data_ingestor_spark.config import loads_config
from mysql_public_data_ingestor_spark.schema import FLIGHTS_SCHEMA
from mysql_public_data_ingestor_spark.sources.jdbc import (
    PartitionSpec,
    jdbc_append,
    jdbc_reader,
    jdbc_write_options,
)
from mysql_public_data_ingestor_spark.topology import bootstrap_ddl, expand_topology

CONFIG_YAML = """
databases:
  prefix: "accept_"
  copies: 2
  extra:
    side:
      tables: 2
  write_workers: 4
mysql:
  user: ingest
  password: ingest-secret
  host: 127.0.0.1
  port: 3306
  dbname: ingest_acceptance
  connection_pool:
    max_open_conns: 8
"""


def _execute_ddl(spark: SparkSession, cfg, statements: list[str]) -> None:
    """Run DDL through a raw JVM JDBC connection (Spark's JDBC reader
    cannot execute DDL)."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    props.setProperty("user", cfg.mysql.username)
    props.setProperty("password", cfg.mysql.password)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.mysql.jdbc_url(), props)
    try:
        stmt = conn.createStatement()
        for sql in statements:
            stmt.execute(sql)
    finally:
        conn.close()


def main() -> int:
    spark = SparkSession.builder.appName("jdbc-acceptance").getOrCreate()
    cfg = loads_config(CONFIG_YAML)
    targets = expand_topology(cfg.databases)

    # 1. DDL bootstrap (CREATE DATABASE/TABLE fan-out)
    _execute_ddl(spark, cfg, bootstrap_ddl(cfg.databases, FLIGHTS_SCHEMA))
    print(f"ok  ddl bootstrap: {len(targets)} targets")

    # 2. transactional append to every target
    rows = [(1700000000 + i, f"icao{i:03d}", f"CS{i}", "Nowhere", None, None,
             1.0 * i, 2.0 * i, 3.0 * i, False, 0.0, 0.0, 0.0, None, 0.0,
             None, False, 0) for i in range(100)]
    df = spark.createDataFrame(rows, schema=FLIGHTS_SCHEMA)
    for t in targets:
        jdbc_append(df, cfg.mysql, t).save()
    print(f"ok  append: 100 rows x {len(targets)} targets")

    # 3. partitioned read equivalence
    t0 = targets[0]
    plain = jdbc_reader(spark, cfg.mysql, t0.qualified).load()
    parted = jdbc_reader(
        spark, cfg.mysql, t0.qualified,
        PartitionSpec("time", 1700000000, 1700000100, 4),
    ).load()
    assert plain.count() == parted.count() == 100, (plain.count(), parted.count())
    print("ok  partitioned read == plain read")

    # 4. pool -> numPartitions mapping
    opts = jdbc_write_options(cfg.mysql, t0)
    assert opts["numPartitions"] == "8", opts
    print("ok  pool mapping (numPartitions=8)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
