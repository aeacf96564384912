"""Config / schema / topology unit tests — mirrors the reference's own
fixtures (FIXTURES.md A4/A5, config/config_test.go, db_manager_test.go).
"""

from __future__ import annotations

import pytest

from mysql_public_data_ingestor_spark.config import (
    DatabasesConfig,
    ExtraDatabase,
    loads_config,
)
from mysql_public_data_ingestor_spark.schema import (
    FLIGHTS_SCHEMA,
    DEFAULT_REGISTRY,
    mysql_type_for,
    render_create_table,
    schema_from_mysql_map,
    spark_type_for,
)
from mysql_public_data_ingestor_spark.topology import bootstrap_ddl, expand_topology

from pyspark.sql import types as T

CONFIG_YAML = """
plugin_spec:
  name: opensky
  auth: {username: u, password: p}
  interval: 60
  fetch_workers: 1
databases:
  prefix: auto_
  table_prefix: data
  copies: 3
  extra:
    foo: {tables: 5}
  write_workers: 5
mysql:
  host: db.example.com
  port: 3306
  username: testuser
  password: testpassword
  pool:
    max_open_conns: 30
    max_idle_conns: 0
    conn_max_lifetime: 0
"""


def test_config_roundtrip_and_pool_defaults():
    # fixture semantics: explicit values kept, zero -> defaults
    # (config/config_test.go:107-117)
    cfg = loads_config(CONFIG_YAML)
    assert cfg.plugin_spec.name == "opensky"
    assert cfg.plugin_spec.interval == 60
    assert cfg.databases.copies == 3
    assert cfg.databases.extra["foo"].tables == 5
    assert cfg.mysql.pool.max_open_conns == 30      # explicit override kept
    assert cfg.mysql.pool.max_idle_conns == 25      # zero -> default
    assert cfg.mysql.pool.conn_max_lifetime == 3600 # zero -> default


def test_topology_expansion_matches_reference_fixture():
    # FIXTURES.md A4 (database/db_manager_test.go:131-162)
    cfg = DatabasesConfig(
        prefix="test_prefix",
        table_prefix="test_table_prefix",
        copies=2,
        extra={"extra1": ExtraDatabase(tables=3)},
    )
    targets = expand_topology(cfg)
    assert [(t.database, t.table) for t in targets] == [
        ("test_prefix1", "test_table_prefix"),
        ("test_prefix2", "test_table_prefix"),
        ("test_prefix_extra1", "test_table_prefix_1"),
        ("test_prefix_extra1", "test_table_prefix_2"),
        ("test_prefix_extra1", "test_table_prefix_3"),
    ]


def test_flights_schema_is_ordered_18_columns():
    # FIXTURES.md A1 — the ordered schema fixes the map-ordering bug
    names = [f.name for f in FLIGHTS_SCHEMA.fields]
    assert names == [
        "time", "icao24", "callsign", "origin_country", "time_position",
        "last_contact", "longitude", "latitude", "baro_altitude", "on_ground",
        "velocity", "true_track", "vertical_rate", "sensors", "geo_altitude",
        "squawk", "spi", "position_source",
    ]
    assert len(names) == 18
    assert all(f.nullable for f in FLIGHTS_SCHEMA.fields)
    assert DEFAULT_REGISTRY.field_names("flights") == names


def test_type_mapping_roundtrip():
    assert isinstance(spark_type_for("VARCHAR(10)"), T.StringType)
    assert isinstance(spark_type_for("FLOAT"), T.DoubleType)  # JSON widening
    assert isinstance(spark_type_for("JSON"), T.StringType)
    assert mysql_type_for(T.DoubleType()) == "DOUBLE"
    assert mysql_type_for(T.ArrayType(T.IntegerType())) == "JSON"
    with pytest.raises(ValueError):
        spark_type_for("GEOMETRY")


def test_ddl_rendering():
    schema = schema_from_mysql_map([("field1", "INT"), ("field2", "VARCHAR(50)")])
    ddl = render_create_table("test_db", "test_table", schema)
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS `test_db`.`test_table` "
        "(`field1` INT, `field2` VARCHAR(255))"
    )


def test_bootstrap_ddl_idempotent_topology():
    cfg = DatabasesConfig(prefix="p", table_prefix="t", copies=2,
                          extra={"x": ExtraDatabase(tables=2)})
    stmts = bootstrap_ddl(cfg, FLIGHTS_SCHEMA)
    creates_db = [s for s in stmts if s.startswith("CREATE DATABASE")]
    creates_tbl = [s for s in stmts if s.startswith("CREATE TABLE")]
    assert len(creates_db) == 3          # p1, p2, p_x
    assert len(creates_tbl) == 4         # t, t, t_1, t_2
    assert all("IF NOT EXISTS" in s for s in stmts)


def test_bootstrap_catalog_topology_executes(spark):
    import uuid

    from mysql_public_data_ingestor_spark.schema import schema_from_mysql_map
    from mysql_public_data_ingestor_spark.topology import (
        SinkTarget,
        bootstrap_catalog_topology,
        expand_topology,
    )

    sfx = uuid.uuid4().hex[:6]
    cfg = DatabasesConfig(prefix=f"cat{sfx}_", table_prefix="t", copies=2,
                          extra={"x": ExtraDatabase(tables=2)})
    schema = schema_from_mysql_map([("field1", "INT"), ("field2", "VARCHAR(50)")])
    try:
        created = bootstrap_catalog_topology(spark, cfg, schema)
        assert len(created) == 4
        # idempotent
        assert bootstrap_catalog_topology(spark, cfg, schema) == created
        # tables are writable/readable through the catalog
        spark.createDataFrame([(1, "value")], schema=schema).write.insertInto(created[0])
        got = spark.table(created[0]).collect()
        assert [(r.field1, r.field2) for r in got] == [(1, "value")]
    finally:
        for t in expand_topology(cfg):
            spark.sql(f"DROP TABLE IF EXISTS `{t.database}`.`{t.table}`")
        for db in {t.database for t in expand_topology(cfg)}:
            spark.sql(f"DROP DATABASE IF EXISTS `{db}`")


REFERENCE_STYLE_YAML = """
plugin_spec:
  name: opensky
  config:
    auth:
      user: "ref_user"
      pass: "ref_pass"
    interval: 30
    fetch_workers: 2
    custom_knob: 7
databases:
  prefix: "auto_"
  copies: 3
  extra:
    foo:
      tables: 5
  write_workers: 5
mysql:
  user: "mysql_user"
  password: "mysql_pass"
  host: "db.example"
  port: 3307
  dbname: "mydb"
  tls_config:
    ca_file: ""
  connection_pool:
    max_open_conns: 30
    max_idle_conns: 30
"""


def test_reference_format_config_loads_with_aliases():
    """The reference's own config.yaml key names (config/config.go yaml
    tags: user/connection_pool/tls_config/dbname, plugin auth user/pass
    nested in the opaque config map) must hydrate the typed model — not
    silently produce empty credentials."""
    cfg = loads_config(REFERENCE_STYLE_YAML)
    assert cfg.mysql.username == "mysql_user"
    assert cfg.mysql.password == "mysql_pass"
    assert cfg.mysql.dbname == "mydb"
    assert cfg.mysql.pool.max_open_conns == 30
    assert cfg.mysql.pool.conn_max_lifetime == 3600  # zero-means-default
    assert cfg.plugin_spec.auth.username == "ref_user"
    assert cfg.plugin_spec.auth.password == "ref_pass"
    assert cfg.plugin_spec.interval == 30
    assert cfg.plugin_spec.fetch_workers == 2
    assert cfg.plugin_spec.config == {"custom_knob": 7}
    assert cfg.mysql.jdbc_url() == "jdbc:mysql://db.example:3307/mydb"


def test_unknown_config_key_raises():
    import pytest

    with pytest.raises(ValueError, match="usrname"):
        loads_config("mysql: {usrname: oops}")


def test_tls_custom_ca_jdbc_mapping():
    """Parity with the reference's custom TLS registration
    (database/db_manager.go:60-113): CA -> VERIFY_CA + truststore,
    +ServerName -> VERIFY_IDENTITY, client pair -> client keystore,
    InsecureSkipVerify -> REQUIRED without truststore."""
    base = "mysql:\n  tls_config:\n"
    ca = loads_config(base + "    ca_file: /etc/ca.pem\n").mysql.jdbc_url()
    assert "sslMode=VERIFY_CA" in ca and "trustCertificateKeyStoreUrl=file:/etc/ca.pem" in ca
    ident = loads_config(
        base + "    ca_file: /etc/ca.pem\n    server_name: db.internal\n"
    ).mysql.jdbc_url()
    assert "sslMode=VERIFY_IDENTITY" in ident
    pair = loads_config(
        base + "    ca_file: /etc/ca.pem\n    cert_file: /c.pem\n    key_file: /k.pem\n"
    ).mysql.jdbc_url()
    assert "clientCertificateKeyStoreUrl=file:/c.pem" in pair
    skip = loads_config(
        base + "    ca_file: /etc/ca.pem\n    insecureskipverify: true\n"
    ).mysql.jdbc_url()
    assert "sslMode=REQUIRED" in skip and "trustCertificateKeyStoreUrl" not in skip
    off = loads_config("mysql: {host: h}").mysql.jdbc_url()
    assert "sslMode" not in off
