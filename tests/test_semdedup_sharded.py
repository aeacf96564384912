"""Sharded SemDeDup centroid-assignment join — the past-broadcast-limit
regime (centroid table over ~1e8 (cid, pos) entries).

Three guarantees: (1) the sharded two-level argmin is value-identical
to the single-broadcast assignment (exact int64 distances make min
associative, ties inside the struct), (2) the plan stays
broadcast-only on the corpus side — one BroadcastHashJoin per shard,
no cartesian, no sort-merge join shuffling the N*D explode, and
(3) the full dedup_semantic_cells query stays DuckDB-oracle-green with
sharding switched on via spark_graft.semdedup.assign_shards.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.operators import ml
from mysql_public_data_ingestor_spark.plans import (
    assert_no_cartesian,
    has_sort_merge_join,
    physical_plan,
)
from mysql_public_data_ingestor_spark.registry import all_queries
from mysql_public_data_ingestor_spark.tables import Tables
from tools.check_correctness import compare, duck_connection

SHARDS = 3


def _fixture(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ex = ml._exploded_embeddings(t)
    c0 = ex.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "pos", F.col("v").alias("c")
    )
    return ex, c0


def test_sharded_assign_matches_single_broadcast(spark, sf_dir):
    ex, c0 = _fixture(spark, sf_dir)
    single = {
        r.vec_id: (r.cid, r.dist2q) for r in ml._assign(ex, c0).collect()
    }
    sharded = {
        r.vec_id: (r.cid, r.dist2q)
        for r in ml._assign(ex, c0, shards=SHARDS).collect()
    }
    assert single == sharded
    assert len(single) > 0


def test_sharded_assign_plan_shape(spark, sf_dir):
    ex, c0 = _fixture(spark, sf_dir)
    sharded = ml._assign(ex, c0, shards=SHARDS)
    plan = physical_plan(sharded)
    # one broadcast hash join per centroid shard; the corpus explode
    # never shuffles on pos
    assert plan.count("BroadcastHashJoin") >= SHARDS, plan
    assert_no_cartesian(sharded)
    assert not has_sort_merge_join(sharded), plan


def test_semdedup_query_oracle_green_with_sharding(spark, sf_dir):
    spark.conf.set("spark_graft.semdedup.assign_shards", str(SHARDS))
    try:
        spec = all_queries()["dedup_semantic_cells"]
        sdf = spec.fn(spark, sf_dir).toPandas()
        con = duck_connection(sf_dir)
        try:
            odf = con.execute(spec.oracle).df()
        finally:
            con.close()
        problems = compare("dedup_semantic_cells", sdf, odf)
        assert not problems, "\n".join(problems)
    finally:
        spark.conf.unset("spark_graft.semdedup.assign_shards")


def test_sample_stratified_stable_under_repartitioning(spark, sf_dir):
    """The salted hash-mod stratified sample is a pure row predicate:
    identical membership and counts under any physical layout (the
    property sampleBy's per-partition RNG cannot give)."""
    import os

    from mysql_public_data_ingestor_spark.operators import advanced

    base = {
        (r.lang, r.n_total, r.n_sampled, r.min_doc_id)
        for r in advanced.sample_stratified(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    class FakeTables:
        documents = docs.repartition(13, "source")

    orig = advanced.Tables
    advanced.Tables = lambda *_: FakeTables()  # type: ignore[assignment]
    try:
        again = {
            (r.lang, r.n_total, r.n_sampled, r.min_doc_id)
            for r in advanced.sample_stratified(spark, sf_dir).collect()
        }
    finally:
        advanced.Tables = orig
    assert base == again


def test_kmeans_oracle_green_with_sharding(spark, sf_dir):
    """ml_kmeans_lloyd takes the same sharded assignment path."""
    spark.conf.set("spark_graft.semdedup.assign_shards", str(SHARDS))
    try:
        spec = all_queries()["ml_kmeans_lloyd"]
        sdf = spec.fn(spark, sf_dir).toPandas()
        con = duck_connection(sf_dir)
        try:
            odf = con.execute(spec.oracle).df()
        finally:
            con.close()
        problems = compare("ml_kmeans_lloyd", sdf, odf)
        assert not problems, "\n".join(problems)
    finally:
        spark.conf.unset("spark_graft.semdedup.assign_shards")
