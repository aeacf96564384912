"""Data-layout operators: multi-dimensional clustering (Z-order).

At 100 TB the scan is won or lost at write time: files clustered so
that each one covers a narrow range of EVERY filter column let
min/max-statistics skipping prune most of the table for 2-D predicates
(``part BETWEEN ... AND supp BETWEEN ...``) where a plain sort only
prunes its leading column. The standard tool is a space-filling curve:
sort by the Morton (Z-order) interleave of the key bits, then write —
rows close on the curve are close in both dimensions.

Everything here is pure int64 bit arithmetic (shift/and/or), identical
in any engine — so even the layout transform is value-verified against
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables

MORTON_BITS = 16  # bits kept per dimension (keys < 65536 at bench SFs)
ZBUCKET_SHIFT = 16  # file bucket = morton >> shift (z-prefix; granularity tracks the key domain)


def morton_interleave(x: Column, y: Column, bits: int = MORTON_BITS) -> Column:
    """Bit-interleave two non-negative int columns into a Z-address:
    bit i of ``x`` lands at position 2i+1, bit i of ``y`` at 2i.

    Built as a sum of per-bit terms — a flat int64 expression tree that
    whole-stage codegen collapses; no UDF, no loop at run time.
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(1), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(1), 2 * i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_morton_interleave(x: str, y: str, bits: int = MORTON_BITS) -> str:
    """DuckDB twin of :func:`morton_interleave` (same bit arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


@register(
    "layout_zorder_stats",
    oracle=f"""
    WITH zed AS (
      SELECT l_partkey, l_suppkey,
             {sql_morton_interleave("l_partkey", "l_suppkey")} >> {ZBUCKET_SHIFT}
               AS zbucket
      FROM lineitem
    )
    SELECT zbucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(l_partkey) AS min_part, max(l_partkey) AS max_part,
           min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
    FROM zed GROUP BY zbucket
    """,
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: assign every lineitem row to the file
    bucket a Z-ordered write would place it in, and report each
    bucket's min/max range over BOTH key columns.

    This is the write-side layout transform plus the exact statistics a
    reader's file-skipping would use: tight per-bucket (min, max) boxes
    in both dimensions mean a 2-D predicate prunes most buckets. The
    Z-address is a flat bit-arithmetic expression (codegen-friendly, no
    UDF); the real write is ``df.repartitionByRange(F.col("z")).
    sortWithinPartitions("z").write...`` — same math, file-sized.
    """
    t = Tables(spark, sf_dir)
    zed = t.lineitem.select(
        "l_partkey",
        "l_suppkey",
        F.shiftright(
            morton_interleave(F.col("l_partkey"), F.col("l_suppkey")), ZBUCKET_SHIFT
        ).alias("zbucket"),
    )
    return zed.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
    )
