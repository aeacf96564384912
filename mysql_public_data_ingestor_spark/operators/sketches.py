"""Probabilistic sketch operators, built deterministically so even the
sketches are value-verified against the DuckDB oracle.

Both sketches use the classic universal hash family
``h(x) = ((a*x + b) mod P) mod W`` with P = 2^31 - 1 and fixed odd
(a, b) seeds — exact int64 arithmetic, bit-identical in any engine, so
the sketch CONTENTS (not just the query answers) are reproducible.
This is the production property that matters: mergeable, re-computable
sketches that two clusters (or two engines) agree on byte-for-byte.

Scale shape:
- A Count-Min sketch is a (depth x width) counter table built by one
  explode + groupBy — partial aggregation makes the shuffle carry at
  most depth*width rows per task, regardless of input size.
- A Bloom filter is the distinct set of set-bit positions — bounded by
  M bits however large the build side is. Probing broadcasts the bit
  set; the big probe side never shuffles. This is exactly Spark's own
  runtime-bloom-pushdown trick, expressed as data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables

_P = 2_147_483_647  # 2^31 - 1 (prime)

# Count-Min: depth 4, width 512
CM_W = 512
CM_SEEDS = [(1_103_515_245, 12_345), (214_013, 2_531_011), (69_069, 362_437), (75, 74)]

# Bloom: 3 hashes into 8192 bits
BLOOM_M = 8192
BLOOM_SEEDS = [(2_654_435_761, 1), (40_503, 30_011), (97, 1_000_003)]


def _uhash(x: Column, a: int, b: int, w: int) -> Column:
    # Reduce x mod P BEFORE the multiply: max |x%P| * max(a) ≈ 5.7e18
    # stays inside int64, whereas raw 64-bit keys * a overflows (ANSI
    # crash — caught by tests/test_bloom_prefilter.py's 2^62 keys).
    # Value-identical to the unreduced form for |x| < P, which covers
    # every fixture key, so oracle pairs are unaffected.
    return (((x.cast("long") % F.lit(_P)) * F.lit(a) + F.lit(b)) % F.lit(_P)) % F.lit(w)


def _sql_uhash(x: str, a: int, b: int, w: int) -> str:
    return f"(((({x} % {_P}) * {a} + {b}) % {_P}) % {w})"


@register(
    "sketch_countmin_heavy_hitters",
    oracle=f"""
    WITH ev AS (
      SELECT user_id FROM events
    ), exact AS (
      SELECT user_id, count(*) AS exact_n FROM ev GROUP BY user_id
    ), top AS (
      SELECT user_id, exact_n FROM exact
      ORDER BY exact_n DESC, user_id LIMIT 20
    ), cells AS (
      {" UNION ALL ".join(
          f"SELECT {j} AS depth, {_sql_uhash('user_id', a, b, CM_W)} AS bucket, "
          "count(*) AS c FROM ev GROUP BY 1, 2"
          for j, (a, b) in enumerate(CM_SEEDS)
      )}
    ), probes AS (
      {" UNION ALL ".join(
          f"SELECT user_id, exact_n, {j} AS depth, "
          f"{_sql_uhash('user_id', a, b, CM_W)} AS bucket FROM top"
          for j, (a, b) in enumerate(CM_SEEDS)
      )}
    )
    SELECT p.user_id, p.exact_n,
           CAST(min(c.c) AS BIGINT) AS cm_estimate,
           CAST(min(c.c) - p.exact_n AS BIGINT) AS overcount
    FROM probes p JOIN cells c ON c.depth = p.depth AND c.bucket = p.bucket
    GROUP BY p.user_id, p.exact_n
    """,
)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (depth 4 x width 512) over per-user event
    counts, probed for the exact top-20 heavy hitters: estimate = min
    over rows of the hashed counter, always >= the exact count.

    Build is one explode(depth) + groupBy(depth, bucket) — the shuffle
    after partial aggregation is bounded by depth*width rows per task
    no matter how many events stream through. The probe side joins the
    (at most depth*width)-row sketch, broadcast. Deterministic hashes
    make the sketch cells byte-identical to the oracle's.
    """
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id")

    cells = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("depth"),
                            _uhash(F.col("user_id"), a, b, CM_W).alias("bucket"),
                        )
                        for j, (a, b) in enumerate(CM_SEEDS)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.depth").alias("depth"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )

    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("user_id"))
        .limit(20)
    )
    probes = top.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _uhash(F.col("user_id"), a, b, CM_W).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(CM_SEEDS)
                ]
            )
        ).alias("probe"),
    ).select("user_id", "exact_n", F.col("probe.depth").alias("depth"), F.col("probe.bucket").alias("bucket"))

    return (
        probes.join(F.broadcast(cells), ["depth", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "user_id",
            "exact_n",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_n")).alias("overcount"),
        )
    )


@register(
    "sketch_bloom_semijoin_prefilter",
    oracle=f"""
    WITH build AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    ), bits AS (
      {" UNION ALL ".join(
          f"SELECT DISTINCT {_sql_uhash('k', a, b, BLOOM_M)} AS bit FROM build"
          for a, b in BLOOM_SEEDS
      )}
    ), bitset AS (
      SELECT DISTINCT bit FROM bits
    ), probe AS (
      SELECT c_custkey AS k FROM customer
    ), hits AS (
      SELECT p.k, count(*) AS n_hits
      FROM (
        {" UNION ALL ".join(
            f"SELECT k, {_sql_uhash('k', a, b, BLOOM_M)} AS bit FROM probe"
            for a, b in BLOOM_SEEDS
        )}
      ) p JOIN bitset s ON s.bit = p.bit
      GROUP BY p.k
    ), flagged AS (
      SELECT p.k,
             CASE WHEN coalesce(h.n_hits, 0) = {len(BLOOM_SEEDS)} THEN 1 ELSE 0 END
               AS candidate,
             CASE WHEN EXISTS (SELECT 1 FROM build b WHERE b.k = p.k)
                  THEN 1 ELSE 0 END AS actual
      FROM probe p LEFT JOIN hits h ON h.k = p.k
    )
    SELECT CAST(count(*) AS BIGINT)        AS n_probed,
           CAST(sum(candidate) AS BIGINT)  AS n_candidates,
           CAST(sum(actual) AS BIGINT)     AS n_members,
           CAST(sum(candidate) - sum(actual) AS BIGINT) AS n_false_positives
    FROM flagged
    """,
)
def sketch_bloom_semijoin_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-filter: build an 8192-bit / 3-hash
    Bloom filter over urgent-order customer keys, probe every customer
    through it, and audit the sketch against the exact semi-join
    (candidates ⊇ members; the gap is the false-positive count).

    The 100 TB pattern: the filter's set-bit positions are a DataFrame
    bounded by M bits regardless of build-side size; broadcast to the
    probe side, it prunes the expensive join's input WITHOUT shuffling
    the big table — the declarative twin of Spark's runtime bloom
    pushdown, with the filter itself persistable and mergeable (union
    of bit sets = filter of union).
    """
    t = Tables(spark, sf_dir)
    build = (
        t.orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bitset = (
        build.select(
            F.explode(
                F.array(*[_uhash(F.col("k"), a, b, BLOOM_M) for a, b in BLOOM_SEEDS])
            ).alias("bit")
        ).distinct()
    )
    probe = t.customer.select(F.col("c_custkey").alias("k"))
    probe_bits = probe.select(
        "k",
        F.explode(
            F.array(*[_uhash(F.col("k"), a, b, BLOOM_M) for a, b in BLOOM_SEEDS])
        ).alias("bit"),
    )
    hits = (
        probe_bits.join(F.broadcast(bitset), "bit")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    actual = build.withColumn("actual_flag", F.lit(1))
    flagged = (
        probe.join(hits, "k", "left")
        .join(F.broadcast(actual), "k", "left")
        .select(
            F.when(F.coalesce(F.col("n_hits"), F.lit(0)) == len(BLOOM_SEEDS), 1)
            .otherwise(0)
            .alias("candidate"),
            F.coalesce(F.col("actual_flag"), F.lit(0)).alias("actual"),
        )
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("candidate").cast("long").alias("n_candidates"),
        F.sum("actual").cast("long").alias("n_members"),
        (F.sum("candidate") - F.sum("actual")).cast("long").alias("n_false_positives"),
    )


@register(
    "sketch_bitmap_exact_distinct",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    UNION ALL
    SELECT NULL AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def sketch_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per day via bitmap partial aggregates, plus
    the all-days total computed by MERGING the daily bitmaps — never
    re-scanning raw events.

    The warehouse-native exact alternative to HLL when the key domain
    is dense integers: ``bitmap_construct_agg`` builds one 32k-bit
    bitmap per (day, bucket) — a mergeable partial, like a sketch but
    exact — ``bitmap_count`` reads off per-day cardinality, and
    ``bitmap_or_agg`` folds the same partials across days for the
    grand total. At 100 TB this is the difference between a second
    full-scan two-shuffle exact-distinct for every rollup level and an
    OR over kilobyte bitmaps: daily partials are built once
    (localCheckpoint here; a materialized view in production — see
    ``streaming/mv.py``) and every coarser period is derived from
    them. Shuffle volume is |days × buckets| bitmaps, independent of
    row count; the bucket width (32768 bits) keeps each partial
    cache-resident even for 1e9-user domains (~30k buckets).

    DuckDB has no bitmap aggregates, so the oracle states the
    semantics directly (COUNT DISTINCT per day + overall) — the gate
    then proves the bitmap algebra exactly reproduces them.
    """
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
        F.bitmap_bit_position(F.col("user_id")).alias("pos"),
    )
    daily_bm = (
        ev.groupBy("day", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
        .localCheckpoint()
    )
    per_day = daily_bm.groupBy("day").agg(
        F.sum(F.bitmap_count(F.col("bm"))).cast("long").alias("n_users")
    )
    total = (
        daily_bm.groupBy("bucket")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
        .agg(F.sum(F.bitmap_count(F.col("bm"))).cast("long").alias("n_users"))
        .select(F.lit(None).cast("timestamp").alias("day"), "n_users")
    )
    return per_day.select("day", "n_users").unionByName(total)


# --------------------------------------------------------------------------
# Bloom-prefiltered anti-join — the composition of the bloom sketch with
# the referential-integrity probe (VERDICT r3 item 7): prune the big
# probe side MAP-SIDE before the shuffle anti-join ever sees it.
# --------------------------------------------------------------------------


def bloom_prefilter_pass(probe: DataFrame, key: str, build_keys: DataFrame) -> DataFrame:
    """Tag each probe row with ``bloom_pass``: True iff all three bloom
    hash bits of ``probe[key]`` are set in the filter built over
    ``build_keys`` (single column ``k``, distinct).

    Shape: the bit set is ≤ BLOOM_M rows however large the build side
    is; it broadcasts, and each of the three membership tests is a
    map-side broadcast left join — the probe side never shuffles. Rows
    with ``bloom_pass = false`` are DEFINITE non-members (bloom filters
    have no false negatives); only the surviving candidates need the
    exact join.
    """
    bitset = (
        build_keys.select(
            F.explode(
                F.array(*[_uhash(F.col("k"), a, b, BLOOM_M) for a, b in BLOOM_SEEDS])
            ).alias("bit")
        ).distinct()
    )
    out = probe
    pass_cols = []
    for i, (a, b) in enumerate(BLOOM_SEEDS):
        bs = F.broadcast(bitset.withColumnRenamed("bit", f"__bit{i}"))
        out = out.join(bs, _uhash(F.col(key), a, b, BLOOM_M) == F.col(f"__bit{i}"), "left")
        pass_cols.append(F.col(f"__bit{i}").isNotNull())
    flag = pass_cols[0]
    for c in pass_cols[1:]:
        flag = flag & c
    return out.withColumn("bloom_pass", flag).drop(*[f"__bit{i}" for i in range(len(BLOOM_SEEDS))])


def bloom_prefiltered_orphan_audit(
    relation: str, fact: DataFrame, fk: str, dim_keys: DataFrame
) -> DataFrame:
    """One-row referential audit of ``fact[fk] -> dim_keys.k`` with the
    bloom prefilter applied before the exact anti-join.

    ``n_bloom_pruned`` rows are proven orphans without ever shuffling
    (map-side bloom miss); only ``n_candidates`` rows reach the shuffle
    anti-join, whose residual misses complete ``n_orphans``. Exactness
    is unconditional — the bloom only moves WHERE the work happens. On
    a clean edge the filter prunes nothing (every key is a member) and
    costs three broadcast hash probes per row; it pays for itself when
    the edge is dirty or selective, which is exactly when the plain
    shuffle anti-join is most expensive at 100 TB.
    """
    flags = bloom_prefilter_pass(fact.select(F.col(fk).alias("k")), "k", dim_keys)
    definite = flags.where(~F.col("bloom_pass")).agg(
        F.count(F.lit(1)).alias("n_bloom_pruned")
    )
    candidates = flags.where(F.col("bloom_pass"))
    n_cand = candidates.agg(F.count(F.lit(1)).alias("n_candidates"))
    resid = candidates.join(dim_keys, "k", "left_anti").agg(
        F.count(F.lit(1)).alias("n_resid")
    )
    checked = fact.agg(F.count(F.lit(1)).alias("n_checked"))
    return (
        checked.crossJoin(F.broadcast(definite))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(resid))
        .select(
            F.lit(relation).alias("relation"),
            F.col("n_checked"),
            F.col("n_bloom_pruned"),
            F.col("n_candidates"),
            (F.col("n_bloom_pruned") + F.col("n_resid")).alias("n_orphans"),
            ((F.col("n_bloom_pruned") + F.col("n_resid")) == 0).alias("passed"),
        )
    )


def _bloom_ri_edge_sql(relation: str, fact_sql: str, build_sql: str) -> str:
    """Oracle half of the prefiltered audit: same universal-hash bloom
    restated in SQL, so the PRUNE COUNTS (not just the final orphan
    count) are value-checked against DuckDB."""
    bits = " UNION ALL ".join(
        f"SELECT DISTINCT {_sql_uhash('k', a, b, BLOOM_M)} AS bit FROM build"
        for a, b in BLOOM_SEEDS
    )
    tests = " AND ".join(
        f"{_sql_uhash('k', a, b, BLOOM_M)} IN (SELECT bit FROM bitset)"
        for a, b in BLOOM_SEEDS
    )
    return f"""
    WITH build AS ({build_sql}),
         bitset AS (SELECT DISTINCT bit FROM ({bits})),
         probe AS ({fact_sql}),
         flagged AS (
           SELECT k, CASE WHEN {tests} THEN 1 ELSE 0 END AS pass FROM probe
         ),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_checked,
                  CAST(coalesce(sum(1 - pass), 0) AS BIGINT) AS n_bloom_pruned,
                  CAST(coalesce(sum(pass), 0) AS BIGINT) AS n_candidates
           FROM flagged
         ),
         resid AS (
           SELECT CAST(count(*) AS BIGINT) AS n_resid FROM flagged f
           WHERE f.pass = 1 AND NOT EXISTS (SELECT 1 FROM build b WHERE b.k = f.k)
         )
    SELECT '{relation}' AS relation, n_checked, n_bloom_pruned, n_candidates,
           n_bloom_pruned + n_resid AS n_orphans,
           (n_bloom_pruned + n_resid = 0) AS passed
    FROM agg, resid
    """


@register(
    "dq_referential_integrity_bloom",
    oracle=(
        "("
        + _bloom_ri_edge_sql(
            "lineitem.l_orderkey->orders",
            "SELECT l_orderkey AS k FROM lineitem",
            "SELECT DISTINCT o_orderkey AS k FROM orders",
        )
        + ") UNION ALL ("
        + _bloom_ri_edge_sql(
            "lineitem.l_orderkey->orders[1-URGENT]",
            "SELECT l_orderkey AS k FROM lineitem",
            "SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'",
        )
        + ")"
    ),
)
def dq_referential_integrity_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit with the bloom prefilter composed in
    front of the fact->fact anti-join (``sketch_bloom_semijoin_prefilter``
    wired into ``dq_referential_integrity``'s expensive edge).

    Two edges make both regimes observable: the full lineitem->orders
    edge is clean (every probe passes the bloom; the exact anti-join
    confirms zero orphans), while the urgent-orders-only edge is
    selective — the bloom proves the bulk of lineitems non-members
    MAP-SIDE (``n_bloom_pruned``), so only the small candidate fraction
    ever reaches the shuffle anti-join. At 100 TB the second shape is
    the win: shuffle volume drops from |fact| to |candidates| while the
    answer stays exact. The filter itself is ≤ 8192 set-bit positions
    regardless of build-side size — broadcastable at any scale — and
    the oracle value-checks the prune counts, not just the orphan
    totals, because the hash family is the same exact int64 arithmetic
    on both engines.
    """
    t = Tables(spark, sf_dir)
    full_keys = t.orders.select(F.col("o_orderkey").alias("k")).distinct()
    urgent_keys = (
        t.orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    a = bloom_prefiltered_orphan_audit(
        "lineitem.l_orderkey->orders", t.lineitem, "l_orderkey", full_keys
    )
    b = bloom_prefiltered_orphan_audit(
        "lineitem.l_orderkey->orders[1-URGENT]", t.lineitem, "l_orderkey", urgent_keys
    )
    return a.unionByName(b)
