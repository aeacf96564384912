"""Loaders for the driver fixture tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under the sf dir.

Scans stay fully declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown + column pruning into the parquet reader for free; at
100 TB these would be partitioned/ bucketed tables behind the same names
and every query below would be unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any realistic scale
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; valid: {TABLE_NAMES}")
    tune(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # The fixture's ts column has shipped in two physical forms:
        # TIMESTAMP(NANOS), which Spark reads as raw nanos (long) under
        # spark.sql.legacy.parquet.nanosAsLong, and plain TIMESTAMP_NTZ
        # micros. Normalize both to session-UTC TIMESTAMP so every
        # downstream operator sees one type and DuckDB (naive micros)
        # parity holds. Integer division for the nanos path — doubles
        # lose precision at 1.7e18.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class Tables:
    """Lazy per-query handle on the fixture tables.

    Attribute access loads (and memoizes) a DataFrame, e.g. ``t.lineitem``.
    Also pins session confs needed for oracle parity (UTC timezone).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        tune(spark)
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLE_NAMES:
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]
