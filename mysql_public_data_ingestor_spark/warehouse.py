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
import re
import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

# Directory-name shape of every table this module manages: a family
# prefix plus the 12-hex fixture_tag. GC only ever touches names
# matching this pattern — user tables in a shared warehouse are
# untouchable by construction.
_MANAGED_NAME = re.compile(r"^[a-z][a-z0-9_]*_[0-9a-f]{12}$")

# Age before a foreign managed directory is considered dead. The tag
# embeds the application id, so another LIVE session's tables have
# names this session will never generate; the TTL exists only to avoid
# racing a concurrent same-host run that is still reading its own
# tables. Longest observed legitimate session is the ~25 min sf0.1
# full-registry gate, so 2 h is conservative.
_GC_TTL_S = int(os.environ.get("SPARK_GRAFT_WAREHOUSE_GC_TTL", "7200"))

# Table names created by THIS session (never GC-eligible).
_SESSION_TABLES: set[str] = set()
_GC_DONE = False

# Wall seconds spent building each materialized table THIS session
# (VERDICT r14 item 7: the bench's min-of-2 fold silently absorbed
# one-time build costs — they land only in cold first runs. bench.py
# reads this to emit a timed "derivations" pseudo-entry so the
# canonical fold charges builds visibly).
BUILD_SECONDS: dict[str, float] = {}


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


def _warehouse_root(spark: SparkSession) -> str:
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    return warehouse.removeprefix("file:")


def gc_stale_tables(spark: SparkSession, now: float | None = None) -> list[str]:
    """Remove managed-table directories left behind by DEAD sessions
    (ADVICE r6: app-id-fingerprinted names mean no session ever reuses
    another's directories, so they accumulate unboundedly). A directory
    is reclaimed when (a) its name matches the managed pattern, (b) this
    session did not create it, and (c) it has not been modified for
    ``_GC_TTL_S``. Reads alone would not refresh a directory's mtime
    (ADVICE r7: a live session running past the TTL would see its own
    tables reclaimed by a newly started session), so ``ensure_table`` —
    the only read path for managed tables — touches the directory on
    every call, keeping any table a live session can still reach
    younger than the TTL. Per-entry deletion failures (e.g. EACCES on
    a foreign leftover) warn and continue — garbage this session does
    not need must not fail this session's query (ADVICE r7; this
    session's OWN orphan locations still fail loudly in
    ``drop_orphan_location``). Returns the removed names; called once
    per session from ensure_table, and directly testable with ``now``."""
    import shutil
    import warnings

    root = _warehouse_root(spark)
    removed: list[str] = []
    if not os.path.isdir(root):
        return removed
    t = time.time() if now is None else now
    for entry in os.listdir(root):
        path = os.path.join(root, entry)
        if (
            _MANAGED_NAME.match(entry)
            and entry not in _SESSION_TABLES
            and os.path.isdir(path)
            and t - os.path.getmtime(path) > _GC_TTL_S
        ):
            try:
                shutil.rmtree(path)
            except OSError as exc:
                warnings.warn(
                    f"warehouse GC: could not remove stale table dir {path}: {exc}"
                )
                continue
            removed.append(entry)
    return removed


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
    global _GC_DONE
    _SESSION_TABLES.add(name)
    if not _GC_DONE:
        _GC_DONE = True
        gc_stale_tables(spark)
    if not spark.catalog.tableExists(name):
        drop_orphan_location(spark, name)
        t0 = time.perf_counter()
        writer = build().write.mode("overwrite")
        if bucket_by:
            writer = writer.bucketBy(buckets, *bucket_by)
            if sort_by:
                writer = writer.sortBy(*sort_by)
        writer.saveAsTable(name)
        BUILD_SECONDS[name] = time.perf_counter() - t0
    # Liveness heartbeat (ADVICE r7): reads do not refresh dir mtime,
    # so touch the directory on every access — every consumer reaches
    # a managed table through this function, keeping a live session's
    # tables younger than the GC TTL for as long as it can read them.
    try:
        os.utime(os.path.join(_warehouse_root(spark), name), None)
    except OSError:
        pass
    return spark.table(name)
