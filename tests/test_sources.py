"""Source plugin + registry + JDBC option tests (mirrors
api_plugins/registry_test.go, opensky_plugin_test.go fixtures)."""

from __future__ import annotations

import json

import pytest

from mysql_public_data_ingestor_spark.config import MySQLConfig, PoolConfig
from mysql_public_data_ingestor_spark.schema import FLIGHTS_SCHEMA
from mysql_public_data_ingestor_spark.sources.jdbc import (
    PartitionSpec,
    jdbc_read_options,
    jdbc_write_options,
)
from mysql_public_data_ingestor_spark.sources.opensky import (
    OpenSkyPlugin,
    parse_states_payload,
)
from mysql_public_data_ingestor_spark.sources.registry import (
    init_plugin,
    load_plugins,
    registered_plugins,
)
from mysql_public_data_ingestor_spark.topology import SinkTarget

# the 18-element mock state vector from opensky_plugin_test.go:62-64
MOCK_STATE = [
    1234567890, "abc123", "CALLSIGN", "Country", 1234567890, 1234567890,
    10.0, 20.0, 30.0, True, 40.0, 50.0, 60.0, None, 70.0, "SQUAWK", True, 1,
]


def payload(states) -> bytes:
    return json.dumps({"time": 1234567890, "states": states}).encode()


def test_parse_states_ordered_and_typed():
    rows = parse_states_payload(payload([MOCK_STATE]))
    assert len(rows) == 1
    row = rows[0]
    assert row[0] == 1234567890 and isinstance(row[0], int)   # time -> long
    assert row[1] == "abc123"
    assert row[6] == 10.0 and isinstance(row[6], float)       # longitude
    assert row[9] is True                                     # on_ground
    assert row[13] is None                                    # sensors null
    assert row[17] == 1                                       # position_source


def test_parse_states_float_widening_fixed():
    # JSON ints arrive as floats for FLOAT columns and floats for INT
    # columns must cast back (opensky_plugin_test.go:104-115)
    state = list(MOCK_STATE)
    state[0] = 1234567890.0   # time as float -> must become int
    state[6] = 10              # longitude as int -> must become float
    rows = parse_states_payload(payload([state]))
    assert rows[0][0] == 1234567890 and isinstance(rows[0][0], int)
    assert rows[0][6] == 10.0 and isinstance(rows[0][6], float)


def test_parse_states_sensors_json_roundtrip():
    state = list(MOCK_STATE)
    state[13] = [1, 2, 3]
    rows = parse_states_payload(payload([state]))
    assert rows[0][13] == "[1, 2, 3]"


def test_parse_short_vector_padded():
    rows = parse_states_payload(payload([MOCK_STATE[:5]]))
    assert len(rows[0]) == 18
    assert rows[0][5] is None


def test_fetch_rows_via_fake_http():
    calls = []

    def fake_get(url, auth):
        calls.append((url, auth))
        return payload([MOCK_STATE, MOCK_STATE])

    p = OpenSkyPlugin(auth=("u", "p"), http_get=fake_get)
    rows = p.fetch_rows()
    assert len(rows) == 2
    assert calls[0][1] == ("u", "p")
    assert p.schema() is FLIGHTS_SCHEMA


def test_validate_config_requires_auth_and_binds_interval():
    # the reference parses but never binds interval (SURVEY defects);
    # here validate_config must bind it
    p = OpenSkyPlugin(http_get=lambda url, auth: payload([]))
    with pytest.raises(ValueError):
        p.validate_config({"auth": {"username": "u"}})
    p.validate_config({"auth": {"username": "u", "password": "pw"}, "interval": 7})
    assert p.interval() == 7
    assert p.auth == ("u", "pw")


def test_registry_register_init_unknown():
    # registry_test.go:10-64 semantics
    load_plugins()
    assert "opensky" in registered_plugins()
    assert init_plugin("opensky").name() == "opensky"
    with pytest.raises(KeyError):
        init_plugin("nope")


def test_jdbc_options_pool_mapping():
    cfg = MySQLConfig(host="h", port=3307, username="u", password="p",
                      pool=PoolConfig(max_open_conns=30))
    w = jdbc_write_options(cfg, SinkTarget("db1", "t1"), batch_size=500)
    assert w["url"] == "jdbc:mysql://h:3307"
    assert w["dbtable"] == "db1.t1"
    assert w["batchsize"] == "500"
    assert w["numPartitions"] == "30"   # pool max_open_conns intent
    r = jdbc_read_options(cfg, "big", PartitionSpec("id", 0, 1_000_000, 16))
    assert r["partitionColumn"] == "id"
    assert r["numPartitions"] == "16"


def test_jdbc_tls_url():
    cfg = MySQLConfig(host="h")
    cfg.tls.enabled = True
    assert "sslMode=REQUIRED" in cfg.jdbc_url()
