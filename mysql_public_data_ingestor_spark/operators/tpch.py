"""TPC-H-shaped benchmark queries adapted to the fixture star schema
(Q4, Q6, Q10, Q14, Q18 shapes; Q1/Q3/Q5 live in relational.py), plus
warehouse patterns: SCD2 merge emulation and a salted skew join.

All revenue sums use the cross-engine exact pattern
(functions/exact.py); limits carry unique tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum, quantize
from ..registry import register
from ..tables import Tables


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-filtered priority counts (late shipments
    stand in for commit<receipt, which the fixture lacks).

    The EXISTS becomes a left-semi join on l_orderkey with the date
    predicate as a join condition — one shuffle, no row duplication.
    """
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 90).cast("timestamp")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(CAST(floor(l_extendedprice * l_discount * 10000.0 + 0.5) AS BIGINT)) / 10000.0
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the pushdown showcase
    (every predicate reaches the parquet scan; zero joins, one tiny
    shuffle for the global agg)."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT))
             / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking (join + agg +
    top-20 with deterministic tie-break)."""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)
                         ELSE 0 END)
             / sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)),
             6) AS promo_share_pct,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio (promo share).

    Both numerator and denominator are quantized int64 sums, so the
    final division is bit-identical across engines before rounding.
    """
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev_q = quantize(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    joined = li.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev_q).otherwise(F.lit(0)))
            / F.sum(rev_q),
            6,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, round(big.total_qty, 2) AS total_qty,
           round(o_totalprice, 2) AS total_price
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via agg-then-join (the
    having-subquery pushed before the join, so only qualifying orders
    shuffle onward)."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("total_qty", 2).alias("total_qty"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


@register(
    "scd2_customer_merge",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal, 1 AS version,
           CASE WHEN c_custkey IN (SELECT c_custkey FROM updates) THEN 0 ELSE 1 END AS is_current
    FROM customer
    UNION ALL
    SELECT c_custkey, new_bal AS acctbal, 2 AS version, 1 AS is_current
    FROM updates
    """,
)
def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge emulation without MERGE INTO (no Delta in this env):
    close changed rows (is_current=0) via a broadcast semi/anti split,
    append version-2 rows — the anti-join + union idiom that scales as
    two broadcast probes over the dimension.
    """
    t = Tables(spark, sf_dir)
    dim = t.customer.select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    updates = dim.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.round(F.col("acctbal") + 100.0, 2).alias("acctbal")
    )
    changed_keys = updates.select("c_custkey")
    closed = dim.join(F.broadcast(changed_keys), "c_custkey", "left_semi").select(
        "c_custkey", "acctbal", F.lit(1).alias("version"), F.lit(0).alias("is_current")
    )
    untouched = dim.join(F.broadcast(changed_keys), "c_custkey", "left_anti").select(
        "c_custkey", "acctbal", F.lit(1).alias("version"), F.lit(1).alias("is_current")
    )
    fresh = updates.select(
        "c_custkey", "acctbal", F.lit(2).alias("version"), F.lit(1).alias("is_current")
    )
    return closed.unionByName(untouched).unionByName(fresh)


N_SALT = 8


@register(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority, n_name, count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY o_orderpriority, n_name
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: salt the hot side's key, replicate the
    small side across all salts, join on (key, salt).

    Result is provably identical to the plain join (the oracle IS the
    plain join) — the point is the mechanics: a skewed key's rows now
    spread over N_SALT reducers instead of one. AQE's skew-join does
    this adaptively; explicit salting is the belt-and-suspenders for
    aggregation skew AQE can't split.
    """
    t = Tables(spark, sf_dir)
    salted_orders = t.orders.withColumn(
        "_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(N_SALT))
    )
    replicated_cust = (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
        .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)])))
    )
    return (
        salted_orders.join(
            replicated_cust,
            (F.col("o_custkey") == F.col("c_custkey")) & (salted_orders["_salt"] == replicated_cust["_salt"]),
        )
        .groupBy("o_orderpriority", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           sum(CAST(floor(volume * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year (two nation roles via aliased broadcast joins)."""
    t = Tables(spark, sf_dir)
    nations = ("NATION_1", "NATION_2")
    n1 = t.nation.filter(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.filter(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = t.supplier.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    cust = t.customer.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(exact_sum(vol, 4).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    WITH volumes AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT) AS vol_q,
             n_name
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_type = 'PROMO'
    )
    SELECT o_year,
           round(sum(CASE WHEN n_name = 'NATION_3' THEN vol_q ELSE 0 END) * 1.0
                 / sum(vol_q), 6) AS mkt_share
    FROM volumes
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of promo-part volume
    per year (conditional ratio of quantized sums — bit-exact division).
    """
    t = Tables(spark, sf_dir)
    promo = t.part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp_nation = t.supplier.join(
        F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    vol_q = quantize(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        t.lineitem.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("vol_q", vol_q)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", F.col("vol_q")).otherwise(F.lit(0)))
                / F.sum("vol_q"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           sum(CAST(floor((l_extendedprice * (1 - l_discount)
                           - p_retailprice * l_quantity * 0.1) * 10000.0 + 0.5) AS BIGINT))
             / 10000.0 AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(year(o_orderdate) AS INT)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year (cost proxy:
    10% of retail price x quantity — the fixture has no partsupp)."""
    t = Tables(spark, sf_dir)
    parts = t.part.filter(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    supp_nation = t.supplier.join(
        F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        t.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(exact_sum(profit, 4).alias("profit"))
    )
