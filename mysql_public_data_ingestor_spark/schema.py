"""Schema registry: ordered StructType schemas + MySQL DDL rendering.

The reference declares schemas as a per-plugin map of column -> MySQL
type string (reference: api_plugins/opensky/opensky_plugin.go:35-54)
and renders CREATE TABLE DDL from it (reference:
database/db_manager.go:149-161). Go map iteration is unordered, which
makes the reference's CREATE/INSERT/value order mutually inconsistent
(see SURVEY.md §1.4); here schemas are ordered ``StructType``s by
construction — the intended ordered 18-column flights schema is the
canonical one from acc_init.sql:4-23.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Spark type <-> MySQL DDL type ----------------------------------------

_SPARK_TO_MYSQL: list[tuple[type, str]] = [
    (T.BooleanType, "BOOLEAN"),
    (T.IntegerType, "INT"),
    (T.LongType, "BIGINT"),
    (T.FloatType, "FLOAT"),
    (T.DoubleType, "DOUBLE"),
    (T.TimestampType, "TIMESTAMP"),
    (T.DateType, "DATE"),
    (T.BinaryType, "BLOB"),
]

_MYSQL_TO_SPARK = {
    "BOOLEAN": T.BooleanType(),
    "TINYINT(1)": T.BooleanType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.DoubleType(),  # JSON decode widens to double; see SURVEY §1.3
    "DOUBLE": T.DoubleType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "JSON": T.StringType(),
    "TEXT": T.StringType(),
    "BLOB": T.BinaryType(),
}


def mysql_type_for(dt: T.DataType) -> str:
    if isinstance(dt, T.StringType):
        return "VARCHAR(255)"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSON"
    for cls, name in _SPARK_TO_MYSQL:
        if isinstance(dt, cls):
            return name
    raise ValueError(f"no MySQL mapping for Spark type {dt}")


def spark_type_for(mysql_type: str) -> T.DataType:
    up = mysql_type.strip().upper()
    if up.startswith("VARCHAR") or up.startswith("CHAR"):
        return T.StringType()
    if up.startswith("DECIMAL"):
        inner = up[up.index("(") + 1 : up.index(")")]
        p, s = (int(x) for x in inner.split(","))
        return T.DecimalType(p, s)
    if up in _MYSQL_TO_SPARK:
        return _MYSQL_TO_SPARK[up]
    raise ValueError(f"no Spark mapping for MySQL type {mysql_type!r}")


def schema_from_mysql_map(columns: list[tuple[str, str]]) -> T.StructType:
    """Ordered (name, mysql_type) pairs -> StructType (all nullable —
    OpenSky state vectors carry pervasive nulls, SURVEY §1.3)."""
    return T.StructType(
        [T.StructField(name, spark_type_for(mtype), True) for name, mtype in columns]
    )


def render_create_table(
    db: str, table: str, schema: T.StructType, if_not_exists: bool = True
) -> str:
    """StructType -> CREATE TABLE DDL (reference: database/db_manager.go:149-161,
    idempotent via IF NOT EXISTS like createDatabase/createTable)."""
    cols = ", ".join(f"`{f.name}` {mysql_type_for(f.dataType)}" for f in schema.fields)
    ine = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE TABLE {ine}`{db}`.`{table}` ({cols})"


def render_create_database(db: str, if_not_exists: bool = True) -> str:
    ine = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE DATABASE {ine}`{db}`"


# --- canonical flights schema (FIXTURES.md A1) -----------------------------

#: ordered 18-column OpenSky state-vector schema
#: (reference: api_plugins/opensky/acc_init.sql:4-23; epoch columns use
#: BIGINT-era LongType for 2038-safety, floats widen to double per JSON)
FLIGHTS_MYSQL_COLUMNS: list[tuple[str, str]] = [
    ("time", "BIGINT"),
    ("icao24", "VARCHAR(10)"),
    ("callsign", "VARCHAR(10)"),
    ("origin_country", "VARCHAR(50)"),
    ("time_position", "BIGINT"),
    ("last_contact", "BIGINT"),
    ("longitude", "FLOAT"),
    ("latitude", "FLOAT"),
    ("baro_altitude", "FLOAT"),
    ("on_ground", "BOOLEAN"),
    ("velocity", "FLOAT"),
    ("true_track", "FLOAT"),
    ("vertical_rate", "FLOAT"),
    ("sensors", "JSON"),
    ("geo_altitude", "FLOAT"),
    ("squawk", "VARCHAR(10)"),
    ("spi", "BOOLEAN"),
    ("position_source", "INT"),
]

FLIGHTS_SCHEMA: T.StructType = schema_from_mysql_map(FLIGHTS_MYSQL_COLUMNS)


class SchemaRegistry:
    """Named ordered schemas (the engine's answer to per-plugin schema
    maps, reference: api_plugins/opensky/opensky_plugin.go:117-123)."""

    def __init__(self) -> None:
        self._schemas: dict[str, T.StructType] = {}

    def register(self, name: str, schema: T.StructType) -> None:
        self._schemas[name] = schema

    def get(self, name: str) -> T.StructType:
        try:
            return self._schemas[name]
        except KeyError:
            raise KeyError(f"unknown schema {name!r}; registered: {sorted(self._schemas)}")

    def field_names(self, name: str) -> list[str]:
        """reference: GetFieldNames, opensky_plugin.go:157-163 — but ordered."""
        return [f.name for f in self.get(name).fields]


DEFAULT_REGISTRY = SchemaRegistry()
DEFAULT_REGISTRY.register("flights", FLIGHTS_SCHEMA)
