"""TPC-H queries Q2/Q11/Q12/Q13/Q15/Q16/Q17/Q19/Q20/Q21/Q22 adapted to
the fixture star schema — completing full Q1-Q22 shape coverage (the
rest live in relational.py / tpch.py).

The fixture has no ``partsupp``; queries that need a part-supplier
relation derive it from ``lineitem`` (GROUP BY l_partkey, l_suppkey),
which preserves each query's *shape* (correlated min, scalar-subquery
threshold, semi/anti chains) — the part the optimizer sees.

Determinism rules (see functions/exact.py): every FP aggregate that
feeds a comparison, ratio, or output is a quantized int64 sum, so both
engines run identical IEEE op sequences; l_quantity is integer-valued so
its plain sums are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum, quantize, sql_exact_sum
from ..registry import register
from ..tables import Tables

REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(floor(({REV}) * 10000.0 + 0.5) AS BIGINT)) / 10000.0
               / sum(l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), euro AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), costed AS (
      SELECT p_partkey, s_name, n_name, unit_cost,
             min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM ps
      JOIN part ON p_partkey = l_partkey
      JOIN euro ON s_suppkey = l_suppkey
      WHERE p_size = 15 AND p_type = 'PROMO'
    )
    SELECT p_partkey, s_name, n_name, round(unit_cost, 6) AS unit_cost
    FROM costed WHERE unit_cost = min_cost
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per qualifying part within a
    region (correlated-min subquery; partsupp derived from lineitem).

    The min is a window over the *aggregated* part-supplier relation
    (|parts| x |suppliers| rows, tiny vs lineitem), partitioned by part
    key — no global window, no re-shuffle beyond the groupBy's.
    """
    t = Tables(spark, sf_dir)
    ps = t.lineitem.groupBy("l_partkey", "l_suppkey").agg(
        (exact_sum(_rev(), 4) / F.sum("l_quantity")).alias("unit_cost")
    )
    euro = (
        t.supplier.join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    parts = t.part.filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO")).select(
        "p_partkey"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey")
    costed = (
        ps.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("min_cost", F.min("unit_cost").over(w))
    )
    return costed.filter(F.col("unit_cost") == F.col("min_cost")).select(
        "p_partkey", "s_name", "n_name", F.round("unit_cost", 6).alias("unit_cost")
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH asia_supp AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), part_value AS (
      SELECT l_partkey,
             sum(CAST(floor(({REV}) * 10000.0 + 0.5) AS BIGINT)) AS value_q
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM asia_supp)
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, value_q / 10000.0 AS part_value
    FROM part_value
    WHERE value_q > (SELECT sum(value_q) FROM part_value) * 0.001
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supplied value (by one region's
    suppliers) exceeds a fraction of the regional total — the
    scalar-subquery-threshold pattern.

    The total is a 1-row aggregate broadcast-cross-joined onto the
    per-part values (no driver collect); both the per-part and total
    values are int64 quantized sums, so the threshold compare is exact.
    """
    t = Tables(spark, sf_dir)
    asia = (
        t.supplier.join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    pv = (
        t.lineitem.join(F.broadcast(asia), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(quantize(_rev(), 4)).alias("value_q"))
    )
    total = pv.agg(F.sum("value_q").alias("total_q"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_q") > F.col("total_q") * 0.001)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_q") / 10000.0).alias("part_value"),
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class line counts per ship mode
    (l_linestatus stands in for l_shipmode, which the fixture lacks)."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution (left join with a
    join-side predicate — the filter lives in the ON clause so
    no-order customers survive with count 0; the comment LIKE filter
    maps to an o_orderpriority predicate)."""
    t = Tables(spark, sf_dir)
    filtered = t.orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t.customer.select("c_custkey")
        .join(filtered, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(floor(({REV}) * 10000.0 + 0.5) AS BIGINT)) AS rev_q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rev_q / 10000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_q = (SELECT max(rev_q) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue (view + scalar
    max subquery). The max is a 1-row agg broadcast onto the per-supplier
    revenues; int64 quantized revenue makes the max/equality exact."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(quantize(_rev(), 4)).alias("rev_q"))
    )
    top = rev.agg(F.max("rev_q").alias("max_q"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_q") == F.col("max_q"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", (F.col("rev_q") / 10000.0).alias("total_revenue"))
    )


@register(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier counts per (brand, type, size) with
    NOT-IN supplier exclusion (negative balance stands in for the
    complaints filter; partsupp derived as distinct lineitem pairs).

    NOT IN on a non-nullable key is a left-anti join against a
    broadcast-able exclusion list.
    """
    t = Tables(spark, sf_dir)
    ps = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    excluded = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    return (
        ps.join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS ap_partkey,
             0.2 * (sum(l_quantity) / count(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) / 10000.0 / 7.0
             AS avg_yearly,
           count(*) AS n_items
    FROM lineitem
    JOIN part    ON p_partkey = l_partkey
    JOIN avg_qty ON ap_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders (correlated AVG
    decorrelated to a per-part aggregate joined back).

    The threshold is sum/count of *integer-valued* quantities — exact in
    FP — so `l_quantity < 0.2*avg` is the same boundary in both engines.
    """
    t = Tables(spark, sf_dir)
    avg_qty = t.lineitem.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count(F.lit(1)))).alias("qty_threshold")
    )
    brand = t.part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        t.lineitem.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (exact_sum(F.col("l_extendedprice"), 4) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {sql_exact_sum(REV)} AS revenue, count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-band predicate over a join — the
    OR-of-ANDs shape Catalyst splits into a common join key plus a
    residual filter (p_size bands stand in for containers)."""
    t = Tables(spark, sf_dir)

    def band(brand: str, max_size: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )

    return (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band("Brand#12", 5, 1, 11) | band("Brand#23", 10, 10, 20) | band("Brand#15", 15, 20, 30))
        .agg(
            exact_sum(_rev(), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q20_potential_promotion_parts",
    oracle="""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ), bulk AS (
      SELECT l_suppkey
      FROM lineitem JOIN red_parts ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 40
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM bulk)
    """,
)
def q20_potential_promotion_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with surplus stock of a part family
    (nested IN-subquery chain -> two semi-joins; availqty>half-shipped
    becomes shipped-quantity-above-threshold on the lineitem-derived
    part-supplier relation)."""
    t = Tables(spark, sf_dir)
    red = t.part.filter(F.col("p_name").like("red%")).select("p_partkey")
    bulk = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        t.supplier.join(F.broadcast(bulk), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier in multi-supplier orders
    (EXISTS + NOT EXISTS on the same relation -> semi-join then
    anti-join, both equi on l_orderkey with a suppkey-inequality
    residual; lateness proxy: shipped >60 days after order date)."""
    t = Tables(spark, sf_dir)
    late = (
        t.lineitem.join(
            t.orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60).cast("timestamp")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = t.lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    others_exist = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_late = others_exist.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(t.supplier), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(*)
               AS threshold
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_custkey % 10 AS INT) AS cntrycode,
           count(*) AS numcust,
           sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) / 100.0 AS totacctbal
    FROM customer, avg_bal
    WHERE CAST(c_custkey % 10 AS INT) IN (1, 2, 3, 4, 5)
      AND c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY CAST(c_custkey % 10 AS INT)
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no recent orders by country
    code
    (scalar-avg subquery + NOT EXISTS anti-join; custkey digits stand in
    for the phone prefix the fixture lacks).

    The average is a quantized-sum / count broadcast as one row, so the
    `acctbal > avg` boundary is identical across engines.
    """
    t = Tables(spark, sf_dir)
    avg_bal = t.customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(quantize(F.col("c_acctbal"), 2)) / 100.0 / F.count(F.lit(1))).alias("threshold")
    )
    code = F.pmod(F.col("c_custkey"), F.lit(10)).cast("int")
    cands = (
        t.customer.withColumn("cntrycode", code)
        .filter(F.col("cntrycode").isin(1, 2, 3, 4, 5))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(
            t.orders.filter(
                F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
    )
    return cands.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum(quantize(F.col("c_acctbal"), 2)) / 100.0).alias("totacctbal"),
    )
