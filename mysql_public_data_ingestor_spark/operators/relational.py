"""Core relational operators: scan/filter/project, joins (all types),
aggregation (incl. rollup/cube/distinct), sort/limit/top-k, set ops,
scalar functions.

Design notes (100 TB posture):
- Every query is a single declarative DataFrame plan — Catalyst pushes
  filters/projections into the parquet scan and picks join strategies.
- Dimension tables (region/nation/supplier, and customer vs lineitem)
  are explicitly ``F.broadcast()`` so the big fact side never shuffles
  for the join; at cluster scale this is the difference between a
  map-side join and a 100 TB sort-merge shuffle.
- Aggregates go partial->final automatically (hash aggregate with
  map-side combine); no driver-side loops anywhere.
- All computed doubles are rounded identically in Spark and the DuckDB
  oracle so FP summation order cannot flip the value-hash.

Capability parity note: the reference implements no relational operators
(SURVEY.md §2.A — it is an ingestion fan-out, main.go:129-158); this
module covers the driver-mandated analytics surface (SURVEY.md §2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum
from ..registry import register
from ..tables import Tables

# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 2)                                     AS sum_base_price,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT))
             / 10000.0                                                        AS sum_disc_price,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000.0 + 0.5)
                    AS BIGINT)) / 10000.0                                     AS sum_charge,
           round(avg(l_quantity), 2)                                          AS avg_qty,
           round(avg(l_extendedprice), 2)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide grouped aggregation with computed measures.

    Partial aggregation (map-side combine) keeps the shuffle tiny: 6
    groups regardless of input size — this plan is flat-out
    scan-bound at 100 TB.
    """
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_sum(disc_price * (1 + F.col("l_tax")), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n_name,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT))
             / 10000.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way star join + filter + agg (TPC-H Q5 shape).

    Join strategy for scale: lineitem (the 100 TB fact) joins orders on
    the shuffle; customer/nation/region are broadcast so the enriched
    side never reshuffles. Catalyst pushes the region filter through the
    broadcast chain before the fact scan is joined.
    """
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    dim = (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    return (
        t.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT))
             / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: join + agg + global top-k.

    LIMIT after ORDER BY runs as TakeOrderedAndProject — each partition
    keeps only its local top-10, the driver merges 10×P rows, so the
    global sort never materializes. Tie-break on o_orderkey keeps the
    cutoff deterministic across engines.
    """
    t = Tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t.orders.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t.lineitem.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r_name, n_name,
           count(*)                    AS n_customers,
           round(sum(c_acctbal), 2)    AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total)."""
    t = Tables(spark, sf_dir)
    joined = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


@register(
    "agg_cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*)                  AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem status dimensions."""
    t = Tables(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact count-distinct (expands to two-phase agg in Spark)."""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_approx_count_distinct",
    oracle=None,  # HLL sketches are engine-specific; driver runs rows-only check
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB-safe distinct.

    No DuckDB oracle: HLL estimates are implementation-defined. The
    companion exact query ``agg_count_distinct`` is the oracle-checked
    twin.
    """
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers")
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(min(l_extendedprice), 2)         AS min_price,
           round(max(l_extendedprice), 2)         AS max_price,
           round(avg(l_extendedprice), 2)         AS mean_price,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(var_samp(l_extendedprice), 2)    AS var_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: min/max/avg/stddev/variance."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_extendedprice"), 2).alias("mean_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
    )


@register(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_finished
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (explicit value list -> conditional-agg plan, no extra pass)."""
    t = Tables(spark, sf_dir)
    p = (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_finished"),
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@register(
    "join_left_order_counts",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey)                       AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "join_semi_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def join_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): no duplication, right side never output."""
    t = Tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return t.customer.join(
        urgent, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    t = Tables(spark, sf_dir)
    return t.customer.join(
        t.orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_full_outer_nation_activity",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.nk, s.nk)          AS nationkey,
           coalesce(c.n_customers, 0)    AS n_customers,
           coalesce(s.n_suppliers, 0)    AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nations with only one side kept)."""
    t = Tables(spark, sf_dir)
    c = t.customer.groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = t.supplier.groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return c.join(s, F.col("c_nk") == F.col("s_nk"), "full_outer").select(
        F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@register(
    "join_range_price_band",
    oracle="""
    SELECT b.band_name, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
    FROM part p
    JOIN (VALUES ('budget', 0.0, 930.0),
                 ('mid',    930.0, 970.0),
                 ('premium',970.0, 1e9)) AS b(band_name, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_name
    """,
)
def join_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join against a tiny banding table.

    The band table is broadcast, so the non-equi condition is evaluated
    map-side (BroadcastNestedLoopJoin) — the only sane physical plan for
    an inequality join at scale when one side is small.
    """
    t = Tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [("budget", 0.0, 930.0), ("mid", 930.0, 970.0), ("premium", 970.0, 1e9)],
        "band_name string, lo double, hi double",
    )
    return (
        t.part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


@register(
    "join_null_safe_segments",
    oracle="""
    WITH a AS (SELECT c_custkey,
                      CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg
               FROM customer),
         b AS (SELECT seg, count(*) AS seg_size FROM a GROUP BY seg)
    SELECT a.c_custkey, a.seg, b.seg_size
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)
def join_null_safe_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM)."""
    t = Tables(spark, sf_dir)
    a = t.customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    b = a.groupBy(F.col("seg").alias("seg_b")).agg(F.count(F.lit(1)).alias("seg_size"))
    return a.join(F.broadcast(b), F.col("seg").eqNullSafe(F.col("seg_b"))).select(
        "c_custkey", "seg", "seg_size"
    )


# ---------------------------------------------------------------------------
# sort / limit / top-k, set ops
# ---------------------------------------------------------------------------


@register(
    "topk_global_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject, no full sort materialized."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
    )


@register(
    "setop_intersect_segments",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def setop_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    t = Tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = t.orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


@register(
    "setop_except_customers",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers minus those with finished orders."""
    t = Tables(spark, sf_dir)
    allc = t.customer.select(F.col("c_custkey").alias("custkey"))
    finished = t.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return allc.subtract(finished)


@register(
    "setop_union_priority_split",
    oracle="""
    SELECT o_orderkey, 'high' AS bucket FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    UNION ALL
    SELECT o_orderkey, 'other' AS bucket FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)
def setop_union_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two disjoint filters (no dedup pass)."""
    t = Tables(spark, sf_dir)
    high = t.orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", F.lit("high").alias("bucket")
    )
    other = t.orders.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", F.lit("other").alias("bucket")
    )
    return high.unionByName(other)


@register(
    "distinct_part_types",
    oracle="SELECT DISTINCT p_brand, p_type FROM part",
)
def distinct_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (hash-aggregate based dedup of the projection)."""
    t = Tables(spark, sf_dir)
    return t.part.select("p_brand", "p_type").distinct()


# ---------------------------------------------------------------------------
# scalar functions
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                                   AS name_lower,
           upper(p_brand)                                  AS brand_upper,
           substr(p_type, 1, 5)                            AS type_prefix,
           concat(p_brand, ':', p_type)                    AS brand_type,
           length(p_name)                                  AS name_len,
           replace(p_name, ' ', '_')                       AS name_snake,
           regexp_extract(p_type, '^([A-Z]+)', 1)          AS type_word,
           CASE WHEN p_type LIKE '%STEEL%' THEN 1 ELSE 0 END AS is_steel
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function pack: case, substring, concat, regexp, LIKE."""
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_word"),
        F.when(F.col("p_type").like("%STEEL%"), 1).otherwise(0).alias("is_steel"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                   AS order_year,
           CAST(month(o_orderdate) AS INT)                  AS order_month,
           CAST(day(o_orderdate) AS INT)                    AS order_day,
           CAST(dayofweek(o_orderdate) AS INT) + 1          AS order_dow,
           date_trunc('month', o_orderdate)                 AS month_start,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY      AS due_ts,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function pack: extract, trunc, arithmetic, datediff.

    Note DuckDB ``dayofweek`` is 0=Sunday while Spark ``dayofweek`` is
    1=Sunday — the oracle adds 1 to line up.
    """
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.to_date("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("timestamp").alias("due_ts"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))).cast("long").alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 1000), 2)       AS abs_delta,
           round(sqrt(l_quantity), 4)                  AS qty_sqrt,
           round(ln(l_extendedprice), 4)               AS price_ln,
           round(pow(l_discount, 2), 6)                AS disc_sq,
           CAST(ceil(l_quantity / 10.0) AS BIGINT)     AS qty_decile,
           CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_hundreds,
           l_orderkey % 7                              AS key_mod
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function pack: abs/sqrt/ln/pow/ceil/floor/mod."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000), 2).alias("abs_delta"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.ceil(F.col("l_quantity") / 10.0).alias("qty_decile"),
        F.floor(F.col("l_extendedprice") / 100.0).alias("price_hundreds"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "case_when_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_bucket,
           o_orderstatus,
           count(*) AS n_orders,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + grouped agg."""
    t = Tables(spark, sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        t.orders.withColumn("price_bucket", bucket)
        .groupBy("price_bucket", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )
