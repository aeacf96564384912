"""Source/sink format coverage: ORC/CSV/JSON round-trips and
partitioned-parquet writes with partition pruning (PartitionFilters in
the scan — the other half of the 100 TB pruning story next to
PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.plans import formatted_plan
from mysql_public_data_ingestor_spark.tables import Tables


def _sample(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    ).limit(500)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    df.write.mode("overwrite").orc(str(tmp_path / "o"))
    back = spark.read.orc(str(tmp_path / "o"))
    assert back.count() == 500
    assert sorted(back.columns) == sorted(df.columns)


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    df.write.mode("overwrite").option("header", True).csv(str(tmp_path / "c"))
    back = spark.read.schema(df.schema).option("header", True).csv(str(tmp_path / "c"))
    assert back.count() == 500
    assert back.schema == df.schema  # explicit schema, no inference drift


def test_json_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    back = spark.read.schema(df.schema).json(str(tmp_path / "j"))
    got = {(r.l_orderkey, r.l_linenumber) for r in back.collect()}
    exp = {(r.l_orderkey, r.l_linenumber) for r in df.collect()}
    assert got == exp


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    t = Tables(spark, sf_dir)
    out = str(tmp_path / "p")
    (
        t.orders.withColumn("order_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan
    # the partition predicate must appear as a partition filter (pruned
    # at planning), not a data filter evaluated per row
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "order_year" in pf, pf
    n = back.count()
    exp = t.orders.filter(F.year("o_orderdate") == 1996).count()
    assert n == exp > 0


def test_xml_column_roundtrip(spark, sf_dir):
    """Native XML functions (Spark 4): to_xml -> from_xml is lossless
    for a typed struct column."""
    t = Tables(spark, sf_dir)
    df = t.orders.select("o_orderkey", "o_totalprice").limit(100)
    xml = df.select(
        "o_orderkey",
        F.to_xml(F.struct("o_orderkey", "o_totalprice")).alias("xml"),
    )
    back = xml.select(
        "o_orderkey",
        F.from_xml("xml", "o_orderkey BIGINT, o_totalprice DOUBLE").alias("p"),
    ).select("o_orderkey", F.col("p.o_totalprice").alias("price"))
    exp = {r.o_orderkey: r.o_totalprice for r in df.collect()}
    got = {r.o_orderkey: r.price for r in back.collect()}
    assert got == exp


def test_observe_metrics_single_pass(spark, sf_dir):
    """df.observe collects pipeline health metrics during the normal
    action — no second scan. The accumulator pattern for row-count /
    null-count auditing inside a 100 TB job."""
    from pyspark.sql import Observation

    t = Tables(spark, sf_dir)
    obs = Observation("audit")
    df = t.orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_custkeys"),
    )
    df.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == t.orders.count()
    assert m["null_custkeys"] == 0
