"""Round-8 scale hardening (VERDICT r7 items 3-4, ADVICE r7):

- ``gated_broadcast`` keeps the graph family's broadcast hints below a
  size budget and falls back to the planner's shuffle join above it —
  a FORCED hint on a 100 TB edge list OOMs where the gate degrades to
  sort-merge. Both plan shapes are asserted here.
- ``iter_checkpoint`` gates the localCheckpoint-vs-persist trade
  (executor-loss recoverability) on SPARK_GRAFT_ITER_PERSIST.
- warehouse GC: ensure_table heartbeats the table dir on every read
  (a live session's tables stay younger than the TTL), and a foreign
  dir that cannot be removed warns instead of failing the query.
"""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.functions.partitioning import (
    gated_broadcast,
    iter_checkpoint,
)
from mysql_public_data_ingestor_spark.plans import physical_plan
from mysql_public_data_ingestor_spark.tables import Tables


def _degree_join(spark, sf_dir, budget):
    t = Tables(spark, sf_dir)
    edges = t.lineitem.select(
        F.col("l_orderkey").alias("u"), F.col("l_partkey").alias("v")
    ).distinct()
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("du"))
    return edges.join(gated_broadcast(deg, budget_bytes=budget), "u")


def test_gated_broadcast_hints_below_budget(spark, sf_dir):
    plan = physical_plan(_degree_join(spark, sf_dir, 1 << 40))
    assert "BroadcastHashJoin" in plan, plan


def test_gated_broadcast_falls_back_above_budget(spark, sf_dir):
    """Budget 0: the estimate always exceeds it -> no hint, and the
    planner (threshold -1 to suppress its own auto-broadcast) picks a
    shuffle join — the graceful 100 TB shape."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = physical_plan(_degree_join(spark, sf_dir, 0))
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_graph_family_uses_gate_not_forced_hint():
    """The triangle machinery and assortativity must route every
    edge/degree-table hint through the gate (VERDICT r7 item 3 named
    these sites): no bare F.broadcast on those tables remains."""
    import inspect

    from mysql_public_data_ingestor_spark.operators import graph

    src = inspect.getsource(graph._oriented) + inspect.getsource(graph._triangles)
    assert "F.broadcast(" not in src
    assert "gated_broadcast(" in src


def test_iter_checkpoint_gates_on_env(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ITER_PERSIST", raising=False)
    assert iter_checkpoint(spark.range(10)).count() == 10  # checkpoint path
    monkeypatch.setenv("SPARK_GRAFT_ITER_PERSIST", "1")
    persisted = iter_checkpoint(spark.range(10))
    assert persisted.storageLevel.useMemory  # persist path taken
    persisted.unpersist()


def test_ensure_table_heartbeats_mtime(spark, sf_dir):
    """ADVICE r7: reads must refresh the managed dir's mtime so a live
    session's tables never age past the GC TTL mid-read."""
    import time

    from mysql_public_data_ingestor_spark import warehouse

    name = f"hb_probe_{uuid.uuid4().hex[:12]}"
    # name must match the managed pattern (prefix + 12 hex)
    assert warehouse._MANAGED_NAME.match(name)
    warehouse.ensure_table(spark, name, lambda: spark.range(3))
    path = os.path.join(warehouse._warehouse_root(spark), name)
    old = time.time() - warehouse._GC_TTL_S - 120
    os.utime(path, (old, old))
    warehouse.ensure_table(spark, name, lambda: spark.range(3))
    assert time.time() - os.path.getmtime(path) < 60
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_gc_unremovable_foreign_dir_warns_not_raises(spark, monkeypatch):
    """ADVICE r7: an EACCES on a foreign leftover must not fail the
    first query of the session."""
    import shutil
    import time
    import warnings

    from mysql_public_data_ingestor_spark import warehouse

    root = warehouse._warehouse_root(spark)
    os.makedirs(root, exist_ok=True)
    stuck = os.path.join(root, "gcfail_aaaaaaaaaaaa")
    os.makedirs(stuck, exist_ok=True)
    now = time.time()
    os.utime(stuck, (now - warehouse._GC_TTL_S - 60,) * 2)

    def deny(path, *a, **k):
        raise OSError(13, "Permission denied", path)

    monkeypatch.setattr(shutil, "rmtree", deny)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        removed = warehouse.gc_stale_tables(spark, now=now)
    assert removed == []
    assert any("could not remove" in str(w.message) for w in caught)
    monkeypatch.undo()
    os.rmdir(stuck)
