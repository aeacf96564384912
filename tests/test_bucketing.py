"""Bucketing: the co-located join pattern — pre-bucket both sides on
the join key so the join runs with ZERO shuffle exchanges. At 100 TB
this turns every recurring fact-fact join on the bucket key into a
local zip of bucket files.
"""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.plans import count_exchanges, physical_plan
from mysql_public_data_ingestor_spark.tables import Tables


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    t = Tables(spark, sf_dir)
    suffix = uuid.uuid4().hex[:8]
    li, od = f"li_bkt_{suffix}", f"od_bkt_{suffix}"
    (
        t.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(li)
    )
    (
        t.orders.select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(od)
    )
    yield li, od
    spark.sql(f"DROP TABLE IF EXISTS {li}")
    spark.sql(f"DROP TABLE IF EXISTS {od}")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed_tables):
    li, od = bucketed_tables
    # force a sort-merge join (at fixture scale the dim side would
    # auto-broadcast, which hides the property under test: bucket
    # co-location removes BOTH join-side shuffles)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li)
            .join(spark.table(od), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = physical_plan(joined)
        # the join itself must not shuffle either side; only the final
        # small aggregation may exchange
        assert "SortMergeJoin" in plan
        assert count_exchanges(joined) <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it returns exactly what the unbucketed join returns
    t = Tables(spark, sf_dir)
    expect = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r.o_orderpriority: r.n for r in joined.collect()}
    exp = {r.o_orderpriority: r.n for r in expect.collect()}
    assert got == exp


def test_registered_bucketed_latency_join_no_join_side_shuffle(spark, sf_dir):
    """VERDICT r4 item 3: the REGISTERED bucketed twin of the repo's
    worst x10-scaling query must join with zero join-side exchanges —
    only the constant-size final aggregate may shuffle."""
    from mysql_public_data_ingestor_spark.operators.bucketed import (
        lineitem_shipment_latency_bucketed,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = lineitem_shipment_latency_bucketed(spark, sf_dir)
        plan = physical_plan(df)
        assert "SortMergeJoin" in plan, plan
        # one exchange total: the 5-key final aggregate
        assert count_exchanges(df) <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_warehouse_gc_reclaims_only_dead_foreign_tables(spark, tmp_path, monkeypatch):
    """ADVICE r6: app-id-fingerprinted table names mean no session ever
    reuses (or cleans) another session's warehouse directories — they
    accumulate forever. gc_stale_tables must remove managed-pattern
    directories that are (a) foreign to this session AND (b) older than
    the TTL, and must never touch this session's own tables, young
    foreign tables, or non-managed names."""
    import os
    import time

    from mysql_public_data_ingestor_spark import warehouse

    root = warehouse._warehouse_root(spark)
    os.makedirs(root, exist_ok=True)

    old_foreign = os.path.join(root, "bkt_lineitem_aaaaaaaaaaaa")
    young_foreign = os.path.join(root, "graph_edges_bbbbbbbbbbbb")
    ours = os.path.join(root, "bkt_orders_cccccccccccc")
    unmanaged = os.path.join(root, "user_table")  # no 12-hex tag suffix
    for d in (old_foreign, young_foreign, ours, unmanaged):
        os.makedirs(d, exist_ok=True)
    monkeypatch.setattr(
        warehouse, "_SESSION_TABLES", {"bkt_orders_cccccccccccc"}
    )
    now = time.time()
    for d in (young_foreign, ours, unmanaged):
        os.utime(d, (now, now))
    os.utime(old_foreign, (now - warehouse._GC_TTL_S - 60,) * 2)

    removed = warehouse.gc_stale_tables(spark, now=now)

    assert removed == ["bkt_lineitem_aaaaaaaaaaaa"]
    assert not os.path.exists(old_foreign)
    assert os.path.exists(young_foreign)
    assert os.path.exists(ours)
    assert os.path.exists(unmanaged)
    for d in (young_foreign, ours, unmanaged):
        os.rmdir(d)
