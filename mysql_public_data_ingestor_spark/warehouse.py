"""Session-scoped materialization of derived tables into the Spark
warehouse.

The lakehouse pattern behind both the bucketed fact tables
(operators/bucketed.py) and the cached co-purchase edge list
(operators/graph.py): a derived table that several queries share is
written ONCE per (application, fixture) and every later invocation
reads the files directly. Table names carry a fingerprint of

  - the fixture path and the source parquet mtimes — a regenerated
    fixture can never silently reuse stale data; and
  - the Spark application id — two sessions sharing a warehouse
    (parallel test/bench runs) get disjoint locations, so one can
    never delete or overwrite a table another is reading (ADVICE r5),
    and orphan-location cleanup can only ever touch THIS application's
    own crashed leftovers, never a live foreign table.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def fixture_tag(spark: SparkSession, sf_dir: str, files: Sequence[str]) -> str:
    """Fingerprint of fixture path + source mtimes + application id."""
    parts = [os.path.abspath(sf_dir), spark.sparkContext.applicationId]
    for name in files:
        p = os.path.join(sf_dir, name)
        try:
            parts.append(str(int(os.path.getmtime(p))))
        except OSError:
            parts.append("missing")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def drop_orphan_location(spark: SparkSession, table: str) -> None:
    """The in-memory catalog forgets tables across sessions but the
    warehouse files persist; Spark then refuses to create a managed
    table over the orphaned location (LOCATION_ALREADY_EXISTS). Remove
    it — the application id in the fingerprinted name guarantees the
    directory belongs to this application (a crashed earlier write),
    never to a concurrently live session. Errors surface: a
    half-deleted location must fail loudly, not read partially."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = os.path.join(warehouse.removeprefix("file:"), table)
    if os.path.exists(path):
        shutil.rmtree(path)


def ensure_table(
    spark: SparkSession,
    name: str,
    build: Callable[[], DataFrame],
    bucket_by: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
    buckets: int = 8,
) -> DataFrame:
    """Materialize ``build()`` as warehouse table ``name`` once per
    session; return a reader DataFrame over it."""
    if not spark.catalog.tableExists(name):
        drop_orphan_location(spark, name)
        writer = build().write.mode("overwrite")
        if bucket_by:
            writer = writer.bucketBy(buckets, *bucket_by)
            if sort_by:
                writer = writer.sortBy(*sort_by)
        writer.saveAsTable(name)
    return spark.table(name)
