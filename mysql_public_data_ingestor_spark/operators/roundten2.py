"""Round-10 registered additions (window slots beyond the activated
roundtenb batch — VERDICT r9 item 5).

Batch themes, per the verdict's follow-through list: a THIRD
mergeable-quantile family member (log-bucketed relative-error
buckets, the DDSketch shape — value-bounded summary beside the
fixed-bin and rank-sample sketches), session-level funnel mining
extending the sequential-pattern kernel, a stratified-sample
representativeness audit, plus standard-toolbox members their
families still lacked (Quade's weighted block-rank test, cohort
retention triangle, variance-ratio random-walk test, conformal
calibration threshold, bloom false-positive audit, Lorenz activity
deciles, pairwise total-variation distance).

House discipline: every query is a DataFrame plan with a DuckDB
oracle twin; exact integer/decimal arithmetic crosses the engine
boundary (ratios via round_int_ratio / round_big_int_ratio); global
ordered passes run only over bounded domains via broadcast non-equi
self-join cumulatives or key-partitioned windows — never an
unpartitioned window over data-scaled rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import Tables


def _dec(c):
    return c.cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# 1. Log-bucketed relative-error quantile sketch (DDSketch shape)
# ---------------------------------------------------------------------------

DD_SUB = 16  # linear sub-buckets per octave -> relative error <= 1/32
DD_QUANTILES = (25, 50, 75, 90, 99)


def _ddsketch_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    qlist = ", ".join(str(q) for q in DD_QUANTILES)
    s = DD_SUB
    return f"""
    WITH rws AS (
      SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), be AS (
      SELECT v, CAST(length(bin(v)) - 1 AS BIGINT) AS e
      FROM rws WHERE v >= 1
    ), bk AS (
      SELECT CAST(e * {s} + ((v - (1::BIGINT << e)) * {s}) // (1::BIGINT << e)
             AS BIGINT) AS bucket
      FROM be
    ), buckets AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM bk GROUP BY bucket
    ), cum AS (
      SELECT a.bucket, CAST(sum(b.cnt) AS BIGINT) AS cc
      FROM buckets a JOIN buckets b ON b.bucket <= a.bucket
      GROUP BY a.bucket
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bk),
    qs AS (SELECT CAST(unnest([{qlist}]) AS BIGINT) AS q),
    est AS (
      SELECT q, (SELECT min(bucket) FROM cum, tot
                 WHERE cc >= (q * n + 99) // 100) AS bucket
      FROM qs
    ), rep AS (
      SELECT q, bucket,
             CAST(((1::BIGINT << (bucket // {s})) * 32
                   + (2 * (bucket % {s}) + 1) * (1::BIGINT << (bucket // {s})))
                  // 32 AS BIGINT) AS est_cents
      FROM est
    )
    SELECT r.q, r.bucket, r.est_cents, t.n AS n_total,
           (SELECT CAST(count(*) AS BIGINT) FROM rws WHERE v <= r.est_cents)
             AS achieved_rank,
           {sql_round_big_int_ratio(
               '''abs(100 * (SELECT count(*) FROM rws WHERE v <= r.est_cents)
                  - r.q * t.n)''',
               '100::HUGEINT * t.n')} AS rank_err
    FROM rep r, tot t WHERE t.n > 0
    """


@register("sketch_ddsketch_quantiles", oracle=_ddsketch_oracle())
def sketch_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-bucketed RELATIVE-ERROR quantile sketch (the DDSketch /
    exponential-histogram shape, Masson et al. VLDB'19): bucket id =
    16 linear sub-buckets per power-of-two octave, so every estimate
    carries a <= 1/32 relative value-error guarantee REGARDLESS of
    the distribution — the third mergeable-quantile family member
    beside the fixed-bin (absolute value bins) and rank-sample
    (rank-spaced, fixed size) sketches; DDSketch's pitch is exactly
    that the other two lack a relative-error bound.

    Everything is integer arithmetic: the octave comes from the
    binary-string length (length(bin(v)) - 1 — no float log2 at
    bucket boundaries to flake cross-engine), sub-bucket and
    midpoint-representative from integer shifts/divides. Bucket count
    is <= 16*64 = 1024 BY MECHANISM (value-range bits, not rows); the
    ascending cumulative is a broadcast non-equi self-join over that
    bounded bucket table — no ordered SinglePartition stage. The
    audit probes each estimate's exact achieved rank against the fact
    scan, like every sketch audit in the registry.
    """
    from ..functions.exact import round_big_int_ratio

    s = DD_SUB
    t = Tables(spark, sf_dir)
    rws = t.lineitem.filter(F.col("l_extendedprice").isNotNull()).select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("v")
    )
    be = rws.filter(F.col("v") >= 1).select(
        "v", (F.length(F.bin(F.col("v"))) - 1).cast("long").alias("e")
    )
    bk = be.selectExpr(
        f"CAST(e * {s} + ((v - shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))) * {s})"
        f" div shiftleft(CAST(1 AS BIGINT), CAST(e AS INT)) AS BIGINT) AS bucket"
    )
    buckets = bk.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    b2 = buckets.select(F.col("bucket").alias("bucket2"), F.col("cnt").alias("cnt2"))
    cum = (
        buckets.join(F.broadcast(b2), F.col("bucket2") <= F.col("bucket"))
        .groupBy("bucket")
        .agg(F.sum("cnt2").alias("cc"))
    )
    tot = bk.agg(F.count(F.lit(1)).alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q).cast("long") for q in DD_QUANTILES])).alias("q")
    )
    est = (
        qs.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(cum),
            F.col("cc") >= F.expr("(q * n + 99) div 100"),
            "left",
        )
        .groupBy("q", "n")
        .agg(F.min("bucket").alias("bucket"))
    )
    rep = est.selectExpr(
        "q",
        "bucket",
        "n",
        f"CAST((shiftleft(CAST(1 AS BIGINT), CAST(bucket div {s} AS INT)) * 32"
        f" + (2 * (bucket % {s}) + 1)"
        f" * shiftleft(CAST(1 AS BIGINT), CAST(bucket div {s} AS INT)))"
        f" div 32 AS BIGINT) AS est_cents",
    ).filter(F.col("n") > 0)
    # Left join from rep so a quantile row survives with achieved_rank 0
    # even when NO value is <= its bucket midpoint (possible when the
    # lowest occupied bucket's values all exceed the midpoint) — mirrors
    # the oracle's scalar-count semantics (ADVICE r10).
    ranks = (
        rws.join(F.broadcast(rep), rws.v <= F.col("est_cents"))
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("ar"))
    )
    ach = rep.join(F.broadcast(ranks), "q", "left").select(
        "q",
        "bucket",
        "est_cents",
        "n",
        F.coalesce(F.col("ar"), F.lit(0).cast("long")).alias("achieved_rank"),
    )
    return ach.select(
        "q",
        "bucket",
        "est_cents",
        F.col("n").alias("n_total"),
        "achieved_rank",
        round_big_int_ratio(
            F.abs(
                F.lit(100) * _dec(F.col("achieved_rank")) - _dec(F.col("q")) * F.col("n")
            ),
            F.lit(100).cast("decimal(38,0)") * F.col("n"),
        ).alias("rank_err"),
    )


# ---------------------------------------------------------------------------
# 2. Weekly cohort retention triangle
# ---------------------------------------------------------------------------

COHORT_MAX_OFFSET = 7


def _cohort_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH uw AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week
      FROM events
    ), fw AS (
      SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id
    ), act AS (
      SELECT f.cohort,
             CAST(datediff('day', f.cohort, u.week) // 7 AS BIGINT) AS week_offset,
             CAST(count(*) AS BIGINT) AS n_active
      FROM uw u JOIN fw f USING (user_id)
      WHERE datediff('day', f.cohort, u.week) // 7 <= {COHORT_MAX_OFFSET}
      GROUP BY 1, 2
    ), sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
      FROM fw GROUP BY cohort
    )
    SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort_week, a.week_offset, a.n_active, s.cohort_size,
           {sql_round_int_ratio('a.n_active', 's.cohort_size')} AS retention
    FROM act a JOIN sizes s USING (cohort)
    """


@register("events_cohort_retention_matrix", oracle=_cohort_oracle())
def events_cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by
    first-active ISO week, then for each (cohort, week-offset <= 7)
    the count and share still active — THE product-analytics retention
    artifact (``events_dau_mau_stickiness`` is its one-number summary,
    ``events_retention_decay_fit`` fits its decay; this is the matrix
    both derive from).

    One user-keyed shuffle produces both the distinct user-weeks and
    each user's cohort (min week); the (cohort, offset) aggregate is
    calendar-bounded (weeks x 8 offsets, independent of row count).
    Week arithmetic is exact integer day-diffs over Monday-start
    date_trunc weeks — identical convention both engines.
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    uw = t.events.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    fw = uw.groupBy("user_id").agg(F.min("week").alias("cohort"))
    off = (F.datediff(F.col("week"), F.col("cohort")) / 7).cast("long")
    act = (
        uw.join(fw, "user_id")
        .select("cohort", off.alias("week_offset"))
        .filter(F.col("week_offset") <= COHORT_MAX_OFFSET)
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = fw.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return act.join(sizes, "cohort").select(
        F.date_format(F.col("cohort"), "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_size",
        round_int_ratio(F.col("n_active"), F.col("cohort_size")).alias("retention"),
    )


# ---------------------------------------------------------------------------
# 3. Stratified-sample representativeness audit
# ---------------------------------------------------------------------------

STRAT_RATE_DEN = 5  # proportional 20% quota per language stratum


def _strat_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH ranked AS (
      SELECT lang, source,
             row_number() OVER (PARTITION BY lang
               ORDER BY ('0x' || substr(sha256('strat|' || CAST(doc_id AS VARCHAR)),
                         1, 15))::BIGINT, doc_id) AS rnk
      FROM documents
    ), per AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST((count(*) + {STRAT_RATE_DEN - 1}) // {STRAT_RATE_DEN} AS BIGINT)
               AS target_k
      FROM ranked GROUP BY lang
    ), cellpop AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS p
      FROM ranked GROUP BY lang, source
    ), cellsmp AS (
      SELECT r.lang, r.source, CAST(count(*) AS BIGINT) AS s
      FROM ranked r JOIN per USING (lang)
      WHERE r.rnk <= per.target_k
      GROUP BY r.lang, r.source
    ), dev AS (
      SELECT p.lang,
             CAST(sum(abs(coalesce(sm.s, 0)::HUGEINT * per.n_docs
                          - p.p::HUGEINT * per.target_k)) AS HUGEINT) AS num
      FROM cellpop p
      JOIN per USING (lang)
      LEFT JOIN cellsmp sm ON sm.lang = p.lang AND sm.source = p.source
      GROUP BY p.lang
    )
    SELECT per.lang, per.n_docs, per.target_k,
           (SELECT CAST(count(*) AS BIGINT) FROM cellpop c
            WHERE c.lang = per.lang) AS n_sources,
           {sql_round_big_int_ratio(
               'dev.num', '2::HUGEINT * per.n_docs * per.target_k')} AS tvd
    FROM per JOIN dev USING (lang)
    ORDER BY per.lang
    """


@register("corpus_stratified_sample_audit", oracle=_strat_oracle())
def corpus_stratified_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified-sample representativeness audit: draw an EXACT 20%
    quota per language stratum (deterministic salted-hash ranking —
    every engine and every rerun picks the same documents), then
    report, per stratum, the total-variation distance between the
    sample's SOURCE distribution and the population's — the check a
    training-data pipeline runs before trusting a sample for eval:
    quota sampling guarantees stratum sizes, this audits what it does
    NOT guarantee (within-stratum composition).

    The per-stratum ranking is a lang-partitioned window (never
    global); cell tables are |langs| x |sources| bounded; the TVD is
    one exact big-integer ratio sum(|s_i*n - p_i*k|) / (2nk) — no
    float shares anywhere.
    """
    from ..functions.exact import round_big_int_ratio
    from ..functions.textnorm import sha256_prefix_i64

    t = Tables(spark, sf_dir)
    h = sha256_prefix_i64(
        F.concat(F.lit("strat|"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = t.documents.select("lang", "source", "doc_id").withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )
    per = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"(count(1) + {STRAT_RATE_DEN - 1}) div {STRAT_RATE_DEN}")
        .cast("long")
        .alias("target_k"),
    )
    cellpop = ranked.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("p"))
    cellsmp = (
        ranked.join(F.broadcast(per), "lang")
        .filter(F.col("rnk") <= F.col("target_k"))
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    dev = (
        cellpop.join(F.broadcast(per), "lang")
        .join(cellsmp, ["lang", "source"], "left")
        .select(
            "lang",
            F.abs(
                _dec(F.coalesce(F.col("s"), F.lit(0))) * F.col("n_docs")
                - _dec(F.col("p")) * F.col("target_k")
            ).alias("d"),
        )
        .groupBy("lang")
        .agg(F.sum("d").alias("num"))
    )
    nsrc = cellpop.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sources"))
    return (
        per.join(dev, "lang")
        .join(nsrc, "lang")
        .select(
            "lang",
            "n_docs",
            "target_k",
            "n_sources",
            round_big_int_ratio(
                F.col("num"),
                F.lit(2).cast("decimal(38,0)") * F.col("n_docs") * F.col("target_k"),
            ).alias("tvd"),
        )
    )


# ---------------------------------------------------------------------------
# 4. Session path-signature mining (first-4-event funnels)
# ---------------------------------------------------------------------------

PATHSIG_LEN = 4
PATHSIG_TOPK = 20


def _pathsig_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH numbered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), per AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             max(CASE WHEN rn = 1 THEN event_type END) AS e1,
             max(CASE WHEN rn = 2 THEN event_type END) AS e2,
             max(CASE WHEN rn = 3 THEN event_type END) AS e3,
             max(CASE WHEN rn = 4 THEN event_type END) AS e4,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM numbered GROUP BY user_id
    ), sig AS (
      SELECT e1 || '>' || e2 || '>' || e3 || '>' || e4 AS signature,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(conv) AS BIGINT) AS n_converted
      FROM per
      WHERE n_events >= {PATHSIG_LEN}
        AND e1 IS NOT NULL AND e2 IS NOT NULL
        AND e3 IS NOT NULL AND e4 IS NOT NULL
      GROUP BY 1
    )
    SELECT signature, n_users, n_converted,
           {sql_round_int_ratio('n_converted', 'n_users')} AS conversion
    FROM sig ORDER BY n_users DESC, signature LIMIT {PATHSIG_TOPK}
    """


@register("events_funnel_path_signatures", oracle=_pathsig_oracle())
def events_funnel_path_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onboarding path-signature mining: the top observed
    first-4-event paths across USER LIFETIMES, each with its user
    count and conversion rate (did the user EVER purchase) — the
    discovery complement of the fixed funnel
    (``events_funnel_time_windowed`` checks ONE prescribed path; this
    surfaces which opening journeys actually occur and which convert
    — the onboarding-analysis artifact). Anchored at user start
    rather than session start because the event stream's sessions are
    near-singleton (max 3 events at fixture scale) while user
    histories are long — the same miner re-anchors by changing one
    partitioning key.

    One user-keyed window ranks each user's history; the per-user
    pivot (first four events + any-purchase flag) is one user-keyed
    aggregate reusing the SAME shuffle; signature domain is
    <= |event_types|^4, so the final aggregate and TakeOrdered top-k
    are bounded. NULL parity is explicit: users with fewer than 4
    events are filtered on BOTH engines (no concat_ws null-skipping).
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    numbered = t.events.select("user_id", "ts", "event_id", "event_type").withColumn(
        "rn", F.row_number().over(w)
    )
    per = numbered.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.max(F.when(F.col("rn") == i, F.col("event_type"))).alias(f"e{i}")
            for i in range(1, PATHSIG_LEN + 1)
        ],
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
    )
    ok = per.filter(
        (F.col("n_events") >= PATHSIG_LEN)
        & F.col("e1").isNotNull()
        & F.col("e2").isNotNull()
        & F.col("e3").isNotNull()
        & F.col("e4").isNotNull()
    )
    sig = (
        ok.select(
            F.concat_ws(">", "e1", "e2", "e3", "e4").alias("signature"), "conv"
        )
        .groupBy("signature")
        .agg(F.count(F.lit(1)).alias("n_users"), F.sum("conv").alias("n_converted"))
    )
    out = sig.select(
        "signature",
        "n_users",
        "n_converted",
        round_int_ratio(F.col("n_converted"), F.col("n_users")).alias("conversion"),
    )
    return out.orderBy(F.col("n_users").desc(), "signature").limit(PATHSIG_TOPK)


# ---------------------------------------------------------------------------
# 5. Quade test over the nation x priority block design
# ---------------------------------------------------------------------------


def _quade_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH cells AS (
      SELECT c.c_nationkey AS blk, o.o_orderpriority AS trt,
             CAST(count(*) AS BIGINT) AS n_cell,
             CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)::HUGEINT)
                  AS HUGEINT) AS s_cell
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), kk AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM cells),
    complete AS (
      SELECT blk FROM cells, kk GROUP BY blk, kk.k
      HAVING count(*) = max(kk.k)
    ), m AS (
      SELECT c.blk, c.trt, CAST(c.s_cell AS DOUBLE) / c.n_cell AS mu
      FROM cells c JOIN complete USING (blk)
    ), ranked AS (
      SELECT blk, trt,
             CAST(row_number() OVER (PARTITION BY blk ORDER BY mu, trt)
                  AS BIGINT) AS r
      FROM m
    ), rng AS (
      SELECT blk, max(mu) - min(mu) AS rg FROM m GROUP BY blk
    ), qrank AS (
      SELECT a.blk,
             CAST(1 + count(b.blk) AS BIGINT) AS qr
      FROM rng a LEFT JOIN rng b
        ON (b.rg < a.rg) OR (b.rg = a.rg AND b.blk < a.blk)
      GROUP BY a.blk
    ), tt AS (
      SELECT r.trt, q.qr * (2 * r.r - (kk.k + 1)) AS t_ij
      FROM ranked r JOIN qrank q USING (blk), kk
    ), bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM complete),
    agg AS (
      SELECT CAST(sum(t_ij::HUGEINT * t_ij) AS HUGEINT) AS a2 FROM tt
    ), tj AS (
      SELECT trt, CAST(sum(t_ij) AS BIGINT) AS t_j FROM tt GROUP BY trt
    ), bstat AS (
      SELECT CAST(sum(t_j::HUGEINT * t_j) AS HUGEINT) AS b2 FROM tj
    )
    SELECT kk.k, bb.b AS n_blocks,
           CAST(agg.a2 AS BIGINT) AS a2, CAST(bstat.b2 AS BIGINT) AS b2,
           CASE WHEN bb.b * agg.a2 - bstat.b2 > 0 THEN
             {sql_round_big_int_ratio(
                 '(bb.b - 1)::HUGEINT * bstat.b2',
                 'bb.b::HUGEINT * agg.a2 - bstat.b2')}
           END AS quade_f
    FROM kk, bb, agg, bstat
    """


@register("stats_quade_nation_priority", oracle=_quade_oracle())
def stats_quade_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade's test over the nation-blocked priority design: the
    WEIGHTED block-rank test completing the blocked-design family
    (Friedman = unweighted "is there an effect", Page = "is it
    ordered", Kendall's W = effect size; Quade weights each block by
    the rank of its RANGE, so blocks where treatments actually differ
    count more — the more powerful test when block sensitivity
    varies, which skewed nation sizes guarantee here).

    The per-block observation is the cell mean (exact cents sum over
    exact count — double division is identical IEEE in both engines);
    within-block ranks come from a blk-partitioned window; the block
    weights come from a broadcast self-join rank over the <= |nations|
    range table (no global window). T_ij = Q_i(2r_ij - (k+1)) makes
    the whole statistic integer: F = (b-1)*sum T_j^2 / (b*sum T_ij^2
    - sum T_j^2), one exact half-up ratio.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
    cells = (
        t.orders.select(
            "o_custkey", F.col("o_orderpriority").alias("trt"), cents.alias("cents")
        )
        .join(
            t.customer.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_nationkey").alias("blk"),
            ),
            "o_custkey",
        )
        .groupBy("blk", "trt")
        .agg(
            F.count(F.lit(1)).alias("n_cell"),
            F.sum(_dec(F.col("cents"))).alias("s_cell"),
        )
    )
    kk = cells.agg(F.countDistinct("trt").alias("k"))
    complete = (
        cells.join(F.broadcast(kk))
        .groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n_trt"), F.max("k").alias("k"))
        .filter(F.col("n_trt") == F.col("k"))
        .select("blk")
    )
    m = cells.join(complete, "blk").select(
        "blk", "trt", (F.col("s_cell").cast("double") / F.col("n_cell")).alias("mu")
    )
    w_blk = Window.partitionBy("blk").orderBy("mu", "trt")
    ranked = m.select("blk", "trt", F.row_number().over(w_blk).cast("long").alias("r"))
    rng = m.groupBy("blk").agg((F.max("mu") - F.min("mu")).alias("rg"))
    r2 = rng.select(F.col("blk").alias("blk2"), F.col("rg").alias("rg2"))
    qrank = (
        rng.join(
            F.broadcast(r2),
            (F.col("rg2") < F.col("rg"))
            | ((F.col("rg2") == F.col("rg")) & (F.col("blk2") < F.col("blk"))),
            "left",
        )
        .groupBy("blk")
        .agg((F.lit(1) + F.count("blk2")).cast("long").alias("qr"))
    )
    tt = (
        ranked.join(F.broadcast(qrank), "blk")
        .crossJoin(F.broadcast(kk))
        .select(
            "trt",
            (_dec(F.col("qr")) * (2 * F.col("r") - (F.col("k") + 1))).alias("t_ij"),
        )
    )
    b = complete.agg(F.count(F.lit(1)).alias("b"))
    agg = tt.agg(F.sum(F.col("t_ij") * F.col("t_ij")).alias("a2"))
    tj = tt.groupBy("trt").agg(F.sum("t_ij").alias("t_j"))
    bstat = tj.agg(F.sum(F.col("t_j") * F.col("t_j")).alias("b2"))
    out = (
        kk.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(bstat))
    )
    den = _dec(F.col("b")) * F.col("a2") - F.col("b2")
    return out.select(
        "k",
        F.col("b").alias("n_blocks"),
        F.col("a2").cast("long").alias("a2"),
        F.col("b2").cast("long").alias("b2"),
        F.when(
            den > 0,
            round_big_int_ratio(_dec(F.col("b") - 1) * F.col("b2"), den),
        ).alias("quade_f"),
    )


# ---------------------------------------------------------------------------
# 6. Pairwise total-variation distance between segment priority mixes
# ---------------------------------------------------------------------------


def _tvd_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cellraw AS (
      SELECT seg, prio, CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY 1, 2
    ), segs AS (SELECT DISTINCT seg FROM j),
    prios AS (SELECT DISTINCT prio FROM j),
    cell AS (
      SELECT s.seg, p.prio, coalesce(c.cnt, 0) AS cnt
      FROM segs s CROSS JOIN prios p
      LEFT JOIN cellraw c ON c.seg = s.seg AND c.prio = p.prio
    ), tots AS (
      SELECT seg, CAST(sum(cnt) AS BIGINT) AS n FROM cell GROUP BY seg
    ), pairs AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b,
             ta.n AS n_a, tb.n AS n_b,
             CAST(sum(abs(a.cnt::HUGEINT * tb.n - b.cnt::HUGEINT * ta.n))
                  AS HUGEINT) AS num
      FROM cell a
      JOIN cell b ON a.prio = b.prio AND a.seg < b.seg
      JOIN tots ta ON ta.seg = a.seg
      JOIN tots tb ON tb.seg = b.seg
      GROUP BY 1, 2, 3, 4
    )
    SELECT seg_a, seg_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             {sql_round_big_int_ratio('num', '2::HUGEINT * n_a * n_b')}
           END AS tvd
    FROM pairs ORDER BY seg_a, seg_b
    """


@register("stats_total_variation_segment_pairs", oracle=_tvd_oracle())
def stats_total_variation_segment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise total-variation distance between the order-priority
    mixes of every market-segment pair: TVD = (1/2) sum_i |p_i - q_i|
    — the L1 sibling of the registry's JS divergence (JS is smooth
    and information-theoretic; TVD is THE metric with the operational
    reading "max probability gap any event can show between the two
    segments"), and unlike JS it is EXACT: sum |c_a*n_b - c_b*n_a| /
    (2 n_a n_b) is one big-integer ratio, no logs.

    One fact-scan aggregate to the |segments| x |priorities| cell
    grid (completed with zero cells so missing categories count, both
    engines identically); the pairwise sweep is a broadcast self-join
    over that <= 25-row grid. Output |segments| choose 2 rows.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    j = t.orders.select("o_custkey", F.col("o_orderpriority").alias("prio")).join(
        t.customer.select(
            F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("seg")
        ),
        "o_custkey",
    )
    cellraw = j.groupBy("seg", "prio").agg(F.count(F.lit(1)).alias("cnt"))
    segs = cellraw.select("seg").distinct()
    prios = cellraw.select("prio").distinct()
    cell = (
        segs.crossJoin(F.broadcast(prios))
        .join(cellraw, ["seg", "prio"], "left")
        .select("seg", "prio", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    )
    tots = cell.groupBy("seg").agg(F.sum("cnt").alias("n"))
    a = cell.select(
        F.col("seg").alias("seg_a"), "prio", F.col("cnt").alias("cnt_a")
    ).join(F.broadcast(tots.select(F.col("seg").alias("seg_a"), F.col("n").alias("n_a"))), "seg_a")
    bdf = cell.select(
        F.col("seg").alias("seg_b"), "prio", F.col("cnt").alias("cnt_b")
    ).join(F.broadcast(tots.select(F.col("seg").alias("seg_b"), F.col("n").alias("n_b"))), "seg_b")
    pairs = (
        a.join(F.broadcast(bdf), ["prio"])
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b", "n_a", "n_b")
        .agg(
            F.sum(
                F.abs(
                    _dec(F.col("cnt_a")) * F.col("n_b")
                    - _dec(F.col("cnt_b")) * F.col("n_a")
                )
            ).alias("num")
        )
    )
    return pairs.select(
        "seg_a",
        "seg_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            round_big_int_ratio(
                F.col("num"), F.lit(2).cast("decimal(38,0)") * F.col("n_a") * F.col("n_b")
            ),
        ).alias("tvd"),
    )


# ---------------------------------------------------------------------------
# 7. Split-conformal calibration threshold per language
# ---------------------------------------------------------------------------

CONF_ALPHA_NUM = 1
CONF_ALPHA_DEN = 10  # alpha = 0.1 -> 90% target coverage


def _conformal_oracle() -> str:
    from .ml import _scored_labeled_sql
    from ..functions.exact import sql_round_int_ratio

    a_n, a_d = CONF_ALPHA_NUM, CONF_ALPHA_DEN
    return (
        _scored_labeled_sql()
        + f"""
    , cal AS (
      SELECT lang, score_q FROM scored WHERE doc_id % 2 = 0
    ), tst AS (
      SELECT lang, score_q FROM scored WHERE doc_id % 2 = 1
    ), ncal AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY lang
    ), grid AS (
      SELECT lang, score_q, CAST(count(*) AS BIGINT) AS cnt
      FROM cal GROUP BY lang, score_q
    ), cum AS (
      SELECT lang, score_q,
             sum(cnt) OVER (PARTITION BY lang ORDER BY score_q) AS cc
      FROM grid
    ), thr AS (
      SELECT n.lang, n.n_cal,
             (SELECT min(score_q) FROM cum c
              WHERE c.lang = n.lang
                AND c.cc >= (({a_d} - {a_n}) * (n.n_cal + 1) + {a_d} - 1) // {a_d})
               AS thr_score_q
      FROM ncal n
    ), cov AS (
      SELECT t.lang,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN ts.score_q <= t.thr_score_q THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_covered
      FROM thr t JOIN tst ts USING (lang)
      GROUP BY t.lang
    )
    SELECT t.lang, t.n_cal, coalesce(c.n_test, 0) AS n_test, t.thr_score_q,
           CASE WHEN coalesce(c.n_test, 0) > 0 AND t.thr_score_q IS NOT NULL THEN
             {sql_round_int_ratio('c.n_covered', 'c.n_test')}
           END AS coverage
    FROM thr t LEFT JOIN cov c USING (lang)
    ORDER BY t.lang
    """
    )


@register("ml_conformal_threshold_by_lang", oracle=_conformal_oracle())
def ml_conformal_threshold_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration per language: the
    ceil((1-alpha)(n+1))-th smallest calibration score is the
    distribution-free threshold whose coverage guarantee (>= 90% of
    fresh points score at or below it) holds with NO model
    assumptions — the modern uncertainty-quantification member of the
    ML family (the other thresholds pick an operating point by
    cost/Youden; conformal picks one with a finite-sample guarantee),
    audited here by measuring the realized coverage on the held-out
    split.

    Deterministic even/odd doc_id split; the order statistic comes
    from a lang-PARTITIONED cumulative over the <= 10001-value
    per-lang score grid (never a global window); the coverage probe
    is one broadcast join of |langs| thresholds back over the test
    half. Output |langs| rows.
    """
    from .ml import _scored_labeled
    from ..functions.exact import round_int_ratio

    a_n, a_d = CONF_ALPHA_NUM, CONF_ALPHA_DEN
    t = Tables(spark, sf_dir)
    sc = _scored_labeled(t)
    cal = sc.filter(F.col("doc_id") % 2 == 0).select("lang", "score_q")
    tst = sc.filter(F.col("doc_id") % 2 == 1).select("lang", "score_q")
    ncal = cal.groupBy("lang").agg(F.count(F.lit(1)).alias("n_cal"))
    grid = cal.groupBy("lang", "score_q").agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("lang")
        .orderBy("score_q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select("lang", "score_q", F.sum("cnt").over(w).alias("cc"))
    kexp = F.expr(
        f"(({a_d} - {a_n}) * (n_cal + 1) + {a_d} - 1) div {a_d}"
    )
    thr = (
        ncal.join(cum, "lang", "left")
        .filter(F.col("cc") >= kexp)
        .groupBy("lang", "n_cal")
        .agg(F.min("score_q").alias("thr_score_q"))
        .join(ncal, ["lang", "n_cal"], "right")
    )
    cov = (
        tst.join(F.broadcast(thr.filter(F.col("thr_score_q").isNotNull())), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("score_q") <= F.col("thr_score_q"), 1).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return thr.join(cov, "lang", "left").select(
        "lang",
        "n_cal",
        F.coalesce(F.col("n_test"), F.lit(0).cast("long")).alias("n_test"),
        "thr_score_q",
        F.when(
            (F.coalesce(F.col("n_test"), F.lit(0)) > 0)
            & F.col("thr_score_q").isNotNull(),
            round_int_ratio(F.col("n_covered"), F.col("n_test")),
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# 8. Bloom-filter false-positive-rate audit
# ---------------------------------------------------------------------------

FPP_M = 65536
FPP_PROBE_OFFSET = 1_000_000_000_000


def _bloom_fpp_oracle() -> str:
    from .sketches import BLOOM_SEEDS, _sql_uhash
    from ..functions.exact import sql_round_int_ratio, sql_round_big_int_ratio

    m = FPP_M
    bits_union = " UNION ".join(
        f"SELECT DISTINCT {_sql_uhash('k', a, b, m)} AS bit FROM build"
        for a, b in BLOOM_SEEDS
    )
    probe_preds = " AND ".join(
        f"{_sql_uhash('p.k', a, b, m)} IN (SELECT bit FROM bits)"
        for a, b in BLOOM_SEEDS
    )
    return f"""
    WITH build AS (
      SELECT DISTINCT c_custkey AS k FROM customer
    ), bits AS ({bits_union}),
    s AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM build),
    probes AS (
      SELECT DISTINCT o_orderkey + {FPP_PROBE_OFFSET} AS k FROM orders
    ), np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
    fp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_false_pos
      FROM probes p
      WHERE {probe_preds}
        AND p.k NOT IN (SELECT k FROM build)
    )
    SELECT CAST({m} AS BIGINT) AS m_bits,
           CAST({len(BLOOM_SEEDS)} AS BIGINT) AS k_hashes,
           nb.n_keys, s.bits_set,
           {sql_round_big_int_ratio(
               's.bits_set::HUGEINT * s.bits_set * s.bits_set',
               f'{m}::HUGEINT * {m} * {m}')} AS fpp_est,
           np.n_probes, fp.n_false_pos,
           CASE WHEN np.n_probes > 0 THEN
             {sql_round_int_ratio('fp.n_false_pos', 'np.n_probes')}
           END AS fpp_measured
    FROM s, nb, np, fp
    """


@register("dq_bloom_fpp_audit", oracle=_bloom_fpp_oracle())
def dq_bloom_fpp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive-rate audit: build the 3-hash
    bloom over customer keys at 65536 bits, probe it with a key set
    DISJOINT from the build side by construction, and report the
    MEASURED false-positive rate beside the occupancy estimate
    (fraction-of-bits-set)^k — the standard fill-rate predictor. This
    closes the loop on the registry's bloom-prefiltered anti-join
    (``dq_referential_integrity_bloom``): that op USES the filter;
    this one measures whether its selectivity promise actually holds
    at the deployed geometry, which is what decides whether the
    prefilter pays for itself at 100 TB.

    The bit table is <= m rows (distinct hash positions — aggregate
    output, not data-scaled); membership is 3 broadcast semi-joins
    against it plus one exact anti-join guard; (s/m)^3 is an exact
    big-integer ratio, no float exp/log anywhere.
    """
    from .sketches import BLOOM_SEEDS, _uhash
    from ..functions.exact import round_int_ratio, round_big_int_ratio

    m = FPP_M
    t = Tables(spark, sf_dir)
    build = t.customer.select(F.col("c_custkey").alias("k")).distinct()
    bits = None
    for a, b in BLOOM_SEEDS:
        part = build.select(_uhash(F.col("k"), a, b, m).alias("bit")).distinct()
        bits = part if bits is None else bits.union(part)
    bits = bits.distinct()
    s = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    nb = build.agg(F.count(F.lit(1)).alias("n_keys"))
    probes = t.orders.select(
        (F.col("o_orderkey") + F.lit(FPP_PROBE_OFFSET)).alias("k")
    ).distinct()
    np_ = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    pos = probes
    for a, b in BLOOM_SEEDS:
        pos = pos.join(
            F.broadcast(bits.select(F.col("bit").alias(f"b_{a}"))),
            _uhash(F.col("k"), a, b, m) == F.col(f"b_{a}"),
            "left_semi",
        )
    fp = pos.join(build, "k", "left_anti").agg(
        F.count(F.lit(1)).alias("n_false_pos")
    )
    out = (
        s.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(fp))
    )
    return out.select(
        F.lit(m).cast("long").alias("m_bits"),
        F.lit(len(BLOOM_SEEDS)).cast("long").alias("k_hashes"),
        "n_keys",
        "bits_set",
        round_big_int_ratio(
            _dec(F.col("bits_set")) * F.col("bits_set") * F.col("bits_set"),
            F.lit(m).cast("decimal(38,0)") * m * m,
        ).alias("fpp_est"),
        "n_probes",
        "n_false_pos",
        F.when(
            F.col("n_probes") > 0,
            round_int_ratio(F.col("n_false_pos"), F.col("n_probes")),
        ).alias("fpp_measured"),
    )


# ---------------------------------------------------------------------------
# 9. Variance-ratio random-walk test on the daily order series
# ---------------------------------------------------------------------------

VR_Q = 5


def _vr_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    q = VR_Q
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), d1 AS (
      SELECT a.x - b.x AS d FROM daily a JOIN daily b ON b.day = a.day - 1
    ), dq AS (
      SELECT a.x - b.x AS s FROM daily a JOIN daily b ON b.day = a.day - {q}
    ), m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(d) AS BIGINT) AS sd,
             CAST(sum(d::HUGEINT * d) AS HUGEINT) AS sdd
      FROM d1
    ), mq AS (
      SELECT CAST(count(*) AS BIGINT) AS nq,
             CAST(sum(s) AS BIGINT) AS ss,
             CAST(sum(s::HUGEINT * s) AS HUGEINT) AS ssq
      FROM dq
    )
    SELECT CAST({q} AS BIGINT) AS q, m1.n1 AS n_diff, mq.nq AS n_qdiff,
           CASE WHEN m1.n1 > 0 AND mq.nq > 0
                     AND m1.n1 * m1.sdd - m1.sd::HUGEINT * m1.sd > 0 THEN
             {sql_round_big_int_ratio(
                 'm1.n1::HUGEINT * m1.n1 * (mq.nq * mq.ssq - mq.ss::HUGEINT * mq.ss)',
                 f'{q}::HUGEINT * mq.nq * mq.nq'
                 ' * (m1.n1 * m1.sdd - m1.sd::HUGEINT * m1.sd)')}
           END AS variance_ratio
    FROM m1, mq
    """


@register("events_variance_ratio_test", oracle=_vr_oracle())
def events_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test on the daily order-count
    series: VR(q) = Var(q-day change) / (q * Var(1-day change)) — 1
    under a random walk, < 1 under mean reversion, > 1 under trend
    persistence; the random-walk diagnostic the trend family (Mann-
    Kendall, runs test, ACF) reads qualitatively, here as ONE exact
    statistic.

    Both difference series come from calendar equi-joins (day = day -
    lag) on the POST-AGGREGATION daily table — no window at all, so
    no global ordered stage exists anywhere in the plan; a calendar
    gap simply drops that pair on BOTH engines identically. Integer
    daily counts make both variances exact big-integer forms, and
    VR is a single half-up big-ratio.
    """
    from ..functions.exact import round_big_int_ratio

    q = VR_Q
    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    a1 = daily.select(F.col("day").alias("day_a"), F.col("x").alias("x_a"))
    d1 = a1.join(
        daily.select(F.col("day").alias("day_b"), F.col("x").alias("x_b")),
        F.col("day_b") == F.date_sub(F.col("day_a"), 1),
    ).select((F.col("x_a") - F.col("x_b")).alias("d"))
    dq = a1.join(
        daily.select(F.col("day").alias("day_b"), F.col("x").alias("x_b")),
        F.col("day_b") == F.date_sub(F.col("day_a"), q),
    ).select((F.col("x_a") - F.col("x_b")).alias("s"))
    m1 = d1.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("d").alias("sd"),
        F.sum(_dec(F.col("d")) * F.col("d")).alias("sdd"),
    )
    mq = dq.agg(
        F.count(F.lit(1)).alias("nq"),
        F.sum("s").alias("ss"),
        F.sum(_dec(F.col("s")) * F.col("s")).alias("ssq"),
    )
    out = m1.crossJoin(F.broadcast(mq))
    num = (
        _dec(F.col("n1"))
        * F.col("n1")
        * (_dec(F.col("nq")) * F.col("ssq") - _dec(F.col("ss")) * F.col("ss"))
    )
    den = (
        F.lit(q).cast("decimal(38,0)")
        * F.col("nq")
        * F.col("nq")
        * (_dec(F.col("n1")) * F.col("sdd") - _dec(F.col("sd")) * F.col("sd"))
    )
    return out.select(
        F.lit(q).cast("long").alias("q"),
        F.col("n1").alias("n_diff"),
        F.col("nq").alias("n_qdiff"),
        F.when(
            (F.col("n1") > 0)
            & (F.col("nq") > 0)
            & (_dec(F.col("n1")) * F.col("sdd") - _dec(F.col("sd")) * F.col("sd") > 0),
            round_big_int_ratio(num, den),
        ).alias("variance_ratio"),
    )


# ---------------------------------------------------------------------------
# 10. Lorenz deciles of per-user event activity
# ---------------------------------------------------------------------------


def _lorenz_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH freq AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id
    ), coc AS (
      SELECT c, CAST(count(*) AS BIGINT) AS nu FROM freq GROUP BY c
    ), cum AS (
      SELECT a.c, a.nu,
             CAST(sum(b.nu) AS BIGINT) AS cu,
             CAST(sum(b.nu::HUGEINT * b.c) AS HUGEINT) AS ce
      FROM coc a JOIN coc b ON b.c < a.c OR (b.c = a.c)
      GROUP BY a.c, a.nu
    ), tot AS (
      SELECT CAST(sum(nu) AS BIGINT) AS u,
             CAST(sum(nu::HUGEINT * c) AS HUGEINT) AS e
      FROM coc
    ), dec AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS decile),
    per AS (
      SELECT d.decile,
             ((d.decile - 1) * t.u) // 10 AS lo,
             (d.decile * t.u) // 10 AS hi,
             t.u, t.e
      FROM dec d, tot t
    ), ev AS (
      SELECT p.decile, p.hi, p.lo, p.e,
             CAST(sum(greatest(0, least(c.cu, p.hi) - greatest(c.cu - c.nu, p.lo))
                      ::HUGEINT * c.c) AS HUGEINT) AS events_d,
             CAST(sum(greatest(0, least(c.cu, p.hi) - (c.cu - c.nu))
                      ::HUGEINT * c.c) AS HUGEINT) AS events_cum
      FROM per p, cum c
      GROUP BY p.decile, p.hi, p.lo, p.e
    )
    SELECT decile, CAST(hi - lo AS BIGINT) AS n_users,
           CASE WHEN e > 0 THEN
             {sql_round_big_int_ratio('events_d', 'e')}
           END AS events_share,
           CASE WHEN e > 0 THEN
             {sql_round_big_int_ratio('events_cum', 'e')}
           END AS cum_share
    FROM ev ORDER BY decile
    """


@register("events_user_activity_lorenz_deciles", oracle=_lorenz_oracle())
def events_user_activity_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of user activity in exact deciles: users ranked
    ascending by event count, split at exact nearest-rank decile
    boundaries (tie groups SPLIT exactly — users within a tie group
    are exchangeable, so the split is well-defined integer
    arithmetic), each decile reporting its share and running share of
    all events — the user-concentration artifact behind "the top 10%
    of users generate X% of activity", the per-user sibling of
    ``stats_gini_by_nation``'s revenue curve.

    The decile machinery never ranks raw users: everything runs over
    the COUNT-OF-COUNTS table (distinct activity levels — the
    diag_key_skew_profile domain, ~sqrt(N) under Zipf), cumulated by
    a broadcast non-equi self-join and intersected with the 10
    boundary intervals by clamped integer overlap. No window, no
    global sort, 10 output rows.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    freq = t.events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    coc = freq.groupBy("c").agg(F.count(F.lit(1)).alias("nu"))
    c2 = coc.select(F.col("c").alias("c2"), F.col("nu").alias("nu2"))
    cum = (
        coc.join(F.broadcast(c2), F.col("c2") <= F.col("c"))
        .groupBy("c", "nu")
        .agg(
            F.sum("nu2").alias("cu"),
            F.sum(_dec(F.col("nu2")) * F.col("c2")).alias("ce"),
        )
    )
    tot = coc.agg(
        F.sum("nu").alias("u"), F.sum(_dec(F.col("nu")) * F.col("c")).alias("e")
    )
    dec = spark.range(1, 11).select(F.col("id").alias("decile"))
    per = dec.crossJoin(F.broadcast(tot)).select(
        "decile",
        F.expr("((decile - 1) * u) div 10").alias("lo"),
        F.expr("(decile * u) div 10").alias("hi"),
        "u",
        "e",
    )
    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cu"), F.col("hi")) - F.greatest(F.col("cu") - F.col("nu"), F.col("lo")),
    )
    ov_cum = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cu"), F.col("hi")) - (F.col("cu") - F.col("nu")),
    )
    ev = (
        per.crossJoin(F.broadcast(cum))
        .groupBy("decile", "hi", "lo", "e")
        .agg(
            F.sum(_dec(ov) * F.col("c")).alias("events_d"),
            F.sum(_dec(ov_cum) * F.col("c")).alias("events_cum"),
        )
    )
    return ev.select(
        "decile",
        (F.col("hi") - F.col("lo")).cast("long").alias("n_users"),
        F.when(
            F.col("e") > 0, round_big_int_ratio(F.col("events_d"), F.col("e"))
        ).alias("events_share"),
        F.when(
            F.col("e") > 0, round_big_int_ratio(F.col("events_cum"), F.col("e"))
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# 11. Truncated stress centrality from seed parts (integer-exact)
# ---------------------------------------------------------------------------

STRESS_SEED_MAX = 4


def _stress_oracle() -> str:
    from .graph import _SQL_EDGES

    return (
        _SQL_EDGES
        + f"""
    , adj AS MATERIALIZED (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ), seeds AS (
      SELECT DISTINCT u AS seed FROM adj WHERE u < {STRESS_SEED_MAX}
    ), d1 AS MATERIALIZED (
      SELECT DISTINCT s.seed, a.v AS node
      FROM seeds s JOIN adj a ON a.u = s.seed
    ), s2 AS MATERIALIZED (
      SELECT x.seed, x.node, CAST(count(*) AS BIGINT) AS sigma2
      FROM (
        SELECT h.seed, a.v AS node
        FROM d1 h JOIN adj a ON a.u = h.node
        WHERE a.v <> h.seed
      ) x WHERE NOT EXISTS (
        SELECT 1 FROM d1 WHERE d1.seed = x.seed AND d1.node = x.node)
      GROUP BY x.seed, x.node
    ), s3 AS MATERIALIZED (
      SELECT x.seed, x.node, CAST(sum(x.sigma2) AS BIGINT) AS sigma3
      FROM (
        SELECT h.seed, a.v AS node, h.sigma2
        FROM s2 h JOIN adj a ON a.u = h.node
        WHERE a.v <> h.seed
      ) x WHERE NOT EXISTS (
        SELECT 1 FROM d1 WHERE d1.seed = x.seed AND d1.node = x.node)
      AND NOT EXISTS (
        SELECT 1 FROM s2 WHERE s2.seed = x.seed AND s2.node = x.node)
      GROUP BY x.seed, x.node
    ), pf2 AS MATERIALIZED (
      SELECT w.seed, w.node,
             CAST(count(t.node) AS BIGINT) AS pf
      FROM s2 w
      LEFT JOIN adj a ON a.u = w.node
      LEFT JOIN s3 t ON t.seed = w.seed AND t.node = a.v
      GROUP BY w.seed, w.node
    ), pf1 AS (
      SELECT w.seed, w.node,
             CAST(coalesce(sum(1 + p.pf), 0) AS BIGINT) AS pf
      FROM d1 w
      LEFT JOIN adj a ON a.u = w.node
      LEFT JOIN pf2 p ON p.seed = w.seed AND p.node = a.v
      GROUP BY w.seed, w.node
    ), interior AS (
      SELECT seed, node, 1::BIGINT AS sigma, pf, 1::BIGINT * pf AS stress
      FROM pf1
      UNION ALL
      SELECT w.seed, w.node, w.sigma2 AS sigma, p.pf, w.sigma2 * p.pf AS stress
      FROM s2 w JOIN pf2 p ON p.seed = w.seed AND p.node = w.node
    ), agg AS (
      SELECT seed,
             CAST(count(*) AS BIGINT) AS n_interior,
             CAST(sum(stress) AS BIGINT) AS total_stress,
             CAST(max(stress) AS BIGINT) AS max_stress
      FROM interior GROUP BY seed
    )
    SELECT a.seed AS seed_part, a.n_interior, a.total_stress, a.max_stress,
           (SELECT min(i.node) FROM interior i
            WHERE i.seed = a.seed AND i.stress = a.max_stress)
             AS max_stress_node
    FROM agg a ORDER BY seed_part
    """
    )


@register("graph_stress_centrality_seeds", oracle=_stress_oracle())
def graph_stress_centrality_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated STRESS centrality from the seed parts: for each
    source s, every node v within 2 hops accumulates sigma_sv *
    paths_from(v) — the number of shortest s->t paths THROUGH v for
    targets t within 3 hops. Stress is the integer-exact member of
    the betweenness family (betweenness divides by sigma_st and goes
    rational; stress counts the same paths unnormalized), so the
    bounded-depth "betweenness approximation" the graph family lacked
    ships with zero float arithmetic: path counts forward (sigma_1=1,
    sigma_2 = sum of d1-neighbors' sigma), DAG path counts backward
    (pf(v) = sum over successors (1 + pf(w))), stress = sigma * pf.

    Same layered-BFS shape as harmonic closeness: each layer is one
    node-keyed equi-join on the session-cached edge table plus
    anti-joins against closer layers; the backward pass is two more
    joins along the SAME DAG edges. Per-seed aggregate output (4
    rows); the argmax node is a min-over-ties final aggregate, not an
    ordered limit.
    """
    from .graph import edge_table

    t = Tables(spark, sf_dir)
    edges = edge_table(spark, t, sf_dir)
    adj = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select("u", "v")
    seeds = adj.filter(F.col("u") < STRESS_SEED_MAX).select(
        F.col("u").alias("seed")
    ).distinct()
    d1 = (
        seeds.join(adj, seeds.seed == adj.u)
        .select("seed", F.col("v").alias("node"))
        .distinct()
    )
    # sigma2: count of d1 predecessors per distance-2 node
    exp2 = (
        d1.join(adj, d1.node == adj.u)
        .filter(F.col("v") != F.col("seed"))
        .select("seed", F.col("v").alias("node2"))
    )
    s2 = (
        exp2.join(
            d1.select("seed", F.col("node").alias("node2")),
            ["seed", "node2"],
            "left_anti",
        )
        .groupBy("seed", F.col("node2").alias("node"))
        .agg(F.count(F.lit(1)).alias("sigma2"))
    )
    exp3 = (
        s2.join(adj, s2.node == adj.u)
        .filter(F.col("v") != F.col("seed"))
        .select("seed", F.col("v").alias("node3"), "sigma2")
    )
    s3 = (
        exp3.join(
            d1.select("seed", F.col("node").alias("node3")), ["seed", "node3"], "left_anti"
        )
        .join(
            s2.select("seed", F.col("node").alias("node3")), ["seed", "node3"], "left_anti"
        )
        .groupBy("seed", F.col("node3").alias("node"))
        .agg(F.sum("sigma2").alias("sigma3"))
    )
    # backward: pf2 = number of d3 successors; pf1 = sum over d2
    # successors of (1 + pf2)
    pf2 = (
        s2.select("seed", "node", "sigma2")
        .join(adj, s2.node == adj.u, "left")
        .join(
            s3.select("seed", F.col("node").alias("v"), F.lit(1).alias("hit3")),
            ["seed", "v"],
            "left",
        )
        .groupBy("seed", "node", "sigma2")
        .agg(F.count("hit3").alias("pf"))
    )
    pf1 = (
        d1.join(adj, d1.node == adj.u, "left")
        .join(
            pf2.select(
                "seed", F.col("node").alias("v"), F.col("pf").alias("pf_w")
            ),
            ["seed", "v"],
            "left",
        )
        .groupBy("seed", "node")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("pf_w").isNotNull(), F.lit(1) + F.col("pf_w"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("pf")
        )
    )
    interior = pf1.select(
        "seed", "node", F.lit(1).cast("long").alias("sigma"), "pf",
        F.col("pf").cast("long").alias("stress"),
    ).unionAll(
        pf2.select(
            "seed", "node", F.col("sigma2").alias("sigma"), "pf",
            (F.col("sigma2") * F.col("pf")).cast("long").alias("stress"),
        )
    )
    agg = interior.groupBy("seed").agg(
        F.count(F.lit(1)).alias("n_interior"),
        F.sum("stress").cast("long").alias("total_stress"),
        F.max("stress").alias("max_stress"),
    )
    amax = (
        interior.join(
            F.broadcast(agg.select("seed", F.col("max_stress").alias("ms"))), "seed"
        )
        .filter(F.col("stress") == F.col("ms"))
        .groupBy("seed")
        .agg(F.min("node").alias("max_stress_node"))
    )
    return agg.join(amax, "seed").select(
        F.col("seed").alias("seed_part"),
        "n_interior",
        "total_stress",
        "max_stress",
        "max_stress_node",
    )


# ---------------------------------------------------------------------------
# 12. Difference-sign (up/down) runs test on the daily series
# ---------------------------------------------------------------------------


def _updown_oracle() -> str:
    return """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT a.day, a.x, CAST(count(*) AS BIGINT) AS k
      FROM daily a JOIN daily b ON b.day <= a.day
      GROUP BY a.day, a.x
    ), d AS (
      SELECT a.k,
             CASE WHEN a.x > b.x THEN 1 WHEN a.x < b.x THEN -1 ELSE 0 END AS sgn
      FROM idx a JOIN idx b ON b.k = a.k - 1
    ), pairs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN a.sgn <> b.sgn THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changes
      FROM d a JOIN d b ON b.k = a.k - 1
    ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
    SELECT nn.n AS n_diffs, p.n_pairs, p.n_changes + 1 AS n_runs,
           CASE WHEN 16 * nn.n - 29 > 0 THEN
             CAST(floor(CAST(3 * (p.n_changes + 1) - (2 * nn.n - 1) AS DOUBLE)
                        * sqrt(10.0::DOUBLE)
                        / (sqrt(CAST(16 * nn.n - 29 AS DOUBLE))
                           * sqrt(9.0::DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
           END AS z_updown
    FROM nn, pairs p
    """


@register("stats_runs_up_down_daily", oracle=_updown_oracle())
def stats_runs_up_down_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-sign (up/down) runs test on the daily order-count
    series: count maximal runs of rising/falling days and compare to
    the randomness expectation E[R] = (2n-1)/3, Var[R] = (16n-29)/90
    — the SERIAL-dependence randomness test complementing
    ``events_runs_test_daily`` (that one tests runs above/below the
    median, i.e. LEVEL clustering; this one tests the signs of the
    DIFFERENCES, i.e. local monotonicity — a sawtooth passes the
    median test and fails this one).

    Adjacency is by RANK in the observed day sequence (a day-index
    from a broadcast non-equi self-join over the ~2.4k-row
    POST-AGGREGATION calendar table — no window), so calendar gaps do
    not silently shrink the pair set and the classical E/Var formulas
    stay calibrated against the n actually counted. Ties (d=0) keep
    sign 0 and count as changes against either direction, identical
    on both engines by construction; only the final z runs in double
    (identical expression order), quantized 1e-6.
    """
    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    b0 = daily.select(F.col("day").alias("day_b"))
    idx = (
        daily.join(F.broadcast(b0), F.col("day_b") <= F.col("day"))
        .groupBy("day", "x")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    a = idx.select(F.col("k").alias("k_a"), F.col("x").alias("x_a"))
    d = a.join(
        idx.select(F.col("k").alias("k_b"), F.col("x").alias("x_b")),
        F.col("k_b") == F.col("k_a") - 1,
    ).select(
        F.col("k_a").alias("k"),
        F.when(F.col("x_a") > F.col("x_b"), 1)
        .when(F.col("x_a") < F.col("x_b"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    d1 = d.select(F.col("k").alias("k_a"), F.col("sgn").alias("sgn_a"))
    pairs = d1.join(
        d.select(F.col("k").alias("k_b"), F.col("sgn").alias("sgn_b")),
        F.col("k_b") == F.col("k_a") - 1,
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("sgn_a") != F.col("sgn_b"), 1).otherwise(0)).alias(
            "n_changes"
        ),
    )
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    out = nn.crossJoin(F.broadcast(pairs))
    z = (
        (3 * (F.col("n_changes") + 1) - (2 * F.col("n") - 1)).cast("double")
        * F.sqrt(F.lit(10.0))
        / (F.sqrt((16 * F.col("n") - 29).cast("double")) * F.sqrt(F.lit(9.0)))
    )
    return out.select(
        F.col("n").alias("n_diffs"),
        "n_pairs",
        (F.col("n_changes") + 1).alias("n_runs"),
        F.when(
            16 * F.col("n") - 29 > 0,
            F.floor(z * F.lit(1000000.0) + F.lit(0.5)).cast("long") / F.lit(1e6),
        ).alias("z_updown"),
    )


# ---------------------------------------------------------------------------
# 13. Most-correlated embedding dimension pairs (whitening diagnostic)
# ---------------------------------------------------------------------------

DIMCORR_TOPK = 10


def _dimcorr_oracle() -> str:
    return f"""
    WITH ex AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS pos,
             CAST(floor(unnest(embedding::DOUBLE[]) * 1000000.0 + 0.5) AS BIGINT)
               AS xq
      FROM embeddings
    ), dims AS (
      SELECT pos, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xq) AS BIGINT) AS sx,
             CAST(sum(xq::HUGEINT * xq) AS HUGEINT) AS sxx
      FROM ex GROUP BY pos
    ), pairsums AS (
      SELECT a.pos AS i, b.pos AS j,
             CAST(sum(a.xq::HUGEINT * b.xq) AS HUGEINT) AS sxy
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos < b.pos
      GROUP BY a.pos, b.pos
    ), stats AS (
      SELECT p.i, p.j,
             di.n,
             di.n::HUGEINT * p.sxy - di.sx::HUGEINT * dj.sx AS cov_num,
             di.n::HUGEINT * di.sxx - di.sx::HUGEINT * di.sx AS var_i,
             dj.n::HUGEINT * dj.sxx - dj.sx::HUGEINT * dj.sx AS var_j
      FROM pairsums p
      JOIN dims di ON di.pos = p.i
      JOIN dims dj ON dj.pos = p.j
    ), r AS (
      SELECT i, j, n,
             CAST(floor(CAST(cov_num AS DOUBLE)
                        / (sqrt(CAST(var_i AS DOUBLE))
                           * sqrt(CAST(var_j AS DOUBLE)))
                        * 1000000.0 + 0.5) AS BIGINT) AS r_x1e6
      FROM stats WHERE var_i > 0 AND var_j > 0
    )
    SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j, n,
           r_x1e6 / 1000000.0 AS pearson_r
    FROM r
    ORDER BY abs(r_x1e6) DESC, i, j LIMIT {DIMCORR_TOPK}
    """


@register("embedding_dim_correlation_topk", oracle=_dimcorr_oracle())
def embedding_dim_correlation_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The most-correlated embedding dimension pairs: top-10 |Pearson
    r| over all d(d-1)/2 coordinate pairs — the whitening/PCA
    diagnostic the embedding-compression family reads before choosing
    a transform (strong off-diagonal correlation is exactly when PQ's
    independent-subspace assumption breaks and a rotation pays;
    per-dim variance alone, which the registry already profiles,
    cannot see it).

    The Gram accumulation explodes each vector once and self-joins on
    vec_id (d^2/2 multiply-adds — the actual FLOPs of X^T X; Spark's
    map-side partial aggregation means the shuffle carries only the
    2016 (i,j) cells per partition, not the exploded rows). Float
    coordinates are 1e-6-quantized to int64 FIRST, so all three
    sufficient statistics are exact integers; only the final r =
    cov/sqrt(var_i var_j) runs in double (identical expression both
    engines), quantized 1e-6, and the top-k orders by the exact
    INTEGER micro-units, never raw doubles.
    """
    t = Tables(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.floor(F.col("v") * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("xq"),
    )
    dims = ex.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum(_dec(F.col("xq")) * F.col("xq")).alias("sxx"),
    )
    b = ex.select(
        "vec_id", F.col("pos").alias("pos_j"), F.col("xq").alias("xq_j")
    )
    pairsums = (
        ex.join(b, "vec_id")
        .filter(F.col("pos") < F.col("pos_j"))
        .groupBy(F.col("pos").alias("i"), F.col("pos_j").alias("j"))
        .agg(F.sum(_dec(F.col("xq")) * F.col("xq_j")).alias("sxy"))
    )
    di = dims.select(
        F.col("pos").alias("i"), F.col("n").alias("n"),
        F.col("sx").alias("sx_i"), F.col("sxx").alias("sxx_i"),
    )
    dj = dims.select(
        F.col("pos").alias("j"),
        F.col("sx").alias("sx_j"), F.col("sxx").alias("sxx_j"),
    )
    stats = (
        pairsums.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select(
            "i", "j", "n",
            (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx_i")) * F.col("sx_j"))
            .alias("cov_num"),
            (_dec(F.col("n")) * F.col("sxx_i") - _dec(F.col("sx_i")) * F.col("sx_i"))
            .alias("var_i"),
            (_dec(F.col("n")) * F.col("sxx_j") - _dec(F.col("sx_j")) * F.col("sx_j"))
            .alias("var_j"),
        )
        .filter((F.col("var_i") > 0) & (F.col("var_j") > 0))
    )
    r_x1e6 = F.floor(
        F.col("cov_num").cast("double")
        / (F.sqrt(F.col("var_i").cast("double")) * F.sqrt(F.col("var_j").cast("double")))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    out = stats.select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        "n",
        r_x1e6.alias("r_x1e6"),
    )
    return (
        out.orderBy(F.abs(F.col("r_x1e6")).desc(), "dim_i", "dim_j")
        .limit(DIMCORR_TOPK)
        .select(
            "dim_i", "dim_j", "n",
            (F.col("r_x1e6") / F.lit(1000000.0)).alias("pearson_r"),
        )
    )


# ---------------------------------------------------------------------------
# 14. Power-law fit of exact-dedup cluster sizes
# ---------------------------------------------------------------------------

PL_MMIN = 2


def _powerlaw_oracle() -> str:
    from ..functions.detmath import ref_det_ln_q, sql_det_ln_steps
    from ..functions.exact import sql_round_big_int_ratio

    l15 = ref_det_ln_q(PL_MMIN - 0.5)
    return f"""
    WITH grp AS (
      SELECT sha256(text) AS h, CAST(count(*) AS BIGINT) AS m
      FROM documents GROUP BY 1
    ), szs AS (
      SELECT m FROM grp WHERE m >= {PL_MMIN}
    ), {sql_det_ln_steps('szs', 'm', 'lm')},
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tail,
             CAST(sum(lm::HUGEINT - {l15}) AS HUGEINT) AS dsum
      FROM lm_rel
    ), tots AS (
      SELECT CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_clusters,
             CAST(max(m) AS BIGINT) AS max_cluster
      FROM grp
    )
    SELECT t.n_clusters, t.n_dup_clusters, t.max_cluster, a.n_tail,
           CASE WHEN a.dsum > 0 THEN
             {sql_round_big_int_ratio(
                 'a.dsum + a.n_tail::HUGEINT * 1000000', 'a.dsum')}
           END AS alpha
    FROM tots t, agg a
    """


@register("corpus_dedup_cluster_powerlaw", oracle=_powerlaw_oracle())
def corpus_dedup_cluster_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law exponent of the exact-dedup cluster-size
    distribution: alpha = 1 + n / sum ln(m_i / (m_min - 1/2)) (the
    Clauset-Shalizi-Newman continuous-MLE approximation at m_min = 2)
    — the summary statistic of HOW duplication concentrates: crawl
    corpora show alpha ~ 2-3 (few huge boilerplate clusters dominate
    removal volume), and a drifting alpha is the early signal that a
    new mirror/template entered the crawl. Joins the fit family
    (Zipf's alpha is the term-frequency analog; this is the
    duplication analog on the DEDUP GROUP table).

    Cluster sizes come from one sha256 group-by (the exact-dedup
    shuffle the pipeline already runs); each tail size's ln goes
    through the det-ln fixed-point chain so the MLE sum is an exact
    integer in 1e-6 units, ln(m_min - 1/2) is the Python-reference
    constant embedded identically in both engines, and alpha is one
    exact half-up big-ratio (1 + n*1e6/D computed as (D + n*1e6)/D).
    """
    from ..functions.detmath import det_ln_q, ref_det_ln_q
    from ..functions.exact import round_big_int_ratio

    l15 = ref_det_ln_q(PL_MMIN - 0.5)
    t = Tables(spark, sf_dir)
    grp = t.documents.groupBy(F.sha2(F.col("text"), 256).alias("h")).agg(
        F.count(F.lit(1)).alias("m")
    )
    szs = grp.filter(F.col("m") >= PL_MMIN).select(
        det_ln_q(F.col("m").cast("double")).alias("lm")
    )
    agg = szs.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(_dec(F.col("lm")) - F.lit(l15)).alias("dsum"),
    )
    tots = grp.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.when(F.col("m") >= 2, 1).otherwise(0)).alias("n_dup_clusters"),
        F.max("m").alias("max_cluster"),
    )
    return tots.crossJoin(F.broadcast(agg)).select(
        "n_clusters",
        "n_dup_clusters",
        "max_cluster",
        "n_tail",
        F.when(
            F.col("dsum") > 0,
            round_big_int_ratio(
                F.col("dsum") + _dec(F.col("n_tail")) * F.lit(1000000), F.col("dsum")
            ),
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# 15. Gains (capture) at fixed review capacities
# ---------------------------------------------------------------------------

GAINS_CAPACITIES = (1, 5, 10, 20)


def _gains_oracle() -> str:
    from .ml import _scored_labeled_sql
    from ..functions.exact import sql_round_big_int_ratio

    caps = ", ".join(str(c) for c in GAINS_CAPACITIES)
    return (
        _scored_labeled_sql()
        + f"""
    , grid AS (
      SELECT score_q, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(label) AS BIGINT) AS cpos
      FROM scored GROUP BY score_q
    ), cum AS (
      SELECT a.score_q, a.cnt, a.cpos,
             CAST(sum(b.cnt) AS BIGINT) AS cc,
             CAST(sum(b.cpos) AS BIGINT) AS ctp
      FROM grid a JOIN grid b ON b.score_q >= a.score_q
      GROUP BY a.score_q, a.cnt, a.cpos
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(cpos) AS BIGINT) AS pos
      FROM grid
    ), caps AS (SELECT CAST(unnest([{caps}]) AS BIGINT) AS capacity_pct),
    kk AS (
      SELECT c.capacity_pct, (c.capacity_pct * t.n + 99) // 100 AS k, t.n, t.pos
      FROM caps c, tot t
    ), bnd AS (
      SELECT k.capacity_pct, k.k, k.n, k.pos,
             (SELECT max(score_q) FROM cum WHERE cc >= k.k) AS bscore
      FROM kk k
    ), fin AS (
      SELECT b.capacity_pct, b.k, b.n, b.pos,
             c.cc - c.cnt AS cc_prev, c.ctp - c.cpos AS tp_prev,
             c.cnt AS cnt_b, c.cpos AS cpos_b
      FROM bnd b JOIN cum c ON c.score_q = b.bscore
    )
    SELECT capacity_pct, k, pos AS n_pos,
           CASE WHEN pos > 0 AND cnt_b > 0 THEN
             {sql_round_big_int_ratio(
                 'tp_prev::HUGEINT * cnt_b + (k - cc_prev)::HUGEINT * cpos_b',
                 'pos::HUGEINT * cnt_b')}
           END AS gain,
           CASE WHEN pos > 0 AND cnt_b > 0 AND k > 0 THEN
             {sql_round_big_int_ratio(
                 '(tp_prev::HUGEINT * cnt_b + (k - cc_prev)::HUGEINT * cpos_b) * n',
                 'pos::HUGEINT * cnt_b * k')}
           END AS lift
    FROM fin ORDER BY capacity_pct
    """
    )


@register("ml_gains_at_capacity", oracle=_gains_oracle())
def ml_gains_at_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains table at fixed review capacities: if a human (or a
    downstream filter) can only inspect the top 1/5/10/20% of
    documents by classifier score, what share of all positives is
    captured (gain) and how much better than random is that (lift)?
    The capacity-indexed view of the ranking the decile lift table
    reads population-indexed — this is the number an annotation-
    budget decision actually consumes.

    Boundary tie groups are split EXACTLY: captured = tp_prev + (k -
    cc_prev) * cpos_b / cnt_b, carried as one big-integer ratio
    (documents within a tie score-group are exchangeable, so the
    proportional split is the well-defined answer, same convention as
    the Lorenz deciles). The descending cumulative is a broadcast
    non-equi self-join over the <= 10001-row score grid — bounded
    domain, NO window, no ordered SinglePartition stage; the boundary
    row per capacity is a max_by final aggregate.
    """
    from .ml import _scored_labeled
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    sc = _scored_labeled(t)
    grid = (
        sc.groupBy("score_q")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("label").alias("cpos"))
        # the <=10001-row grid feeds four consumers (bins, totals,
        # boundary probe, in-bin cumulative) — hash the corpus ONCE
        .localCheckpoint(eager=False)
    )
    # Two-pass boundary-bin refinement (the agg_top_value_share
    # pattern): a direct non-equi self-join cumulative over the
    # ~10001-row grid costs ~5*10^7 nested-loop pairs (measured ~5 s
    # at sf0.1); coarse 100-point bins cut that to <= 101^2 + one
    # bin-partitioned window over <= 100 rows.
    gb = grid.withColumn("gbin", F.expr("score_q div 100"))
    bins = gb.groupBy("gbin").agg(
        F.sum("cnt").alias("bcnt"), F.sum("cpos").alias("bpos")
    )
    b2 = bins.select(
        F.col("gbin").alias("gbin2"), F.col("bcnt").alias("bcnt2"),
        F.col("bpos").alias("bpos2"),
    )
    bcum = (
        bins.join(F.broadcast(b2), F.col("gbin2") >= F.col("gbin"))
        .groupBy("gbin", "bcnt", "bpos")
        .agg(F.sum("bcnt2").alias("ccnt"), F.sum("bpos2").alias("ctp_b"))
    )
    tot = grid.agg(F.sum("cnt").alias("n"), F.sum("cpos").alias("pos"))
    caps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(c).cast("long") for c in GAINS_CAPACITIES])
        ).alias("capacity_pct")
    )
    kk = caps.crossJoin(F.broadcast(tot)).select(
        "capacity_pct", F.expr("(capacity_pct * n + 99) div 100").alias("k"), "n", "pos"
    )
    # boundary bin = highest-score bin whose running count reaches k
    bbin = (
        kk.join(F.broadcast(bcum), F.col("ccnt") >= F.col("k"), "left")
        .groupBy("capacity_pct", "k", "n", "pos")
        .agg(
            F.max_by(
                F.struct("gbin", "bcnt", "bpos", "ccnt", "ctp_b"), F.col("gbin")
            ).alias("b")
        )
        .select(
            "capacity_pct", "k", "n", "pos",
            F.col("b.gbin").alias("bbin"),
            (F.col("b.ccnt") - F.col("b.bcnt")).alias("hi_cc"),
            (F.col("b.ctp_b") - F.col("b.bpos")).alias("hi_tp"),
        )
    )
    w_in = (
        Window.partitionBy("capacity_pct", "bbin")
        .orderBy(F.col("score_q").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inbin = gb.join(F.broadcast(bbin), gb.gbin == F.col("bbin"))
    cum_in = inbin.select(
        "capacity_pct", "k", "n", "pos", "score_q", "cnt", "cpos",
        (F.col("hi_cc") + F.sum("cnt").over(w_in)).alias("cc"),
        (F.col("hi_tp") + F.sum("cpos").over(w_in)).alias("ctp"),
    )
    fin = (
        cum_in.filter(F.col("cc") >= F.col("k"))
        .groupBy("capacity_pct", "k", "n", "pos")
        .agg(
            F.max_by(
                F.struct("cc", "ctp", "cnt", "cpos"), F.col("score_q")
            ).alias("b")
        )
        .select(
            "capacity_pct", "k", "n", "pos",
            (F.col("b.cc") - F.col("b.cnt")).alias("cc_prev"),
            (F.col("b.ctp") - F.col("b.cpos")).alias("tp_prev"),
            F.col("b.cnt").alias("cnt_b"),
            F.col("b.cpos").alias("cpos_b"),
        )
    )
    cap_num = _dec(F.col("tp_prev")) * F.col("cnt_b") + _dec(
        F.col("k") - F.col("cc_prev")
    ) * F.col("cpos_b")
    return fin.select(
        "capacity_pct",
        "k",
        F.col("pos").alias("n_pos"),
        F.when(
            (F.col("pos") > 0) & (F.col("cnt_b") > 0),
            round_big_int_ratio(cap_num, _dec(F.col("pos")) * F.col("cnt_b")),
        ).alias("gain"),
        F.when(
            (F.col("pos") > 0) & (F.col("cnt_b") > 0) & (F.col("k") > 0),
            round_big_int_ratio(
                cap_num * F.col("n"),
                _dec(F.col("pos")) * F.col("cnt_b") * F.col("k"),
            ),
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# 16. CUSUM-of-squares variance changepoint on the daily series
# ---------------------------------------------------------------------------


def _cusumsq_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), nn AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x::HUGEINT * x) AS HUGEINT) AS s
      FROM daily
    ), idx AS (
      SELECT a.day, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(b.x::HUGEINT * b.x) AS HUGEINT) AS sk
      FROM daily a JOIN daily b ON b.day <= a.day
      GROUP BY a.day
    ), dev AS (
      SELECT i.day, i.k, abs(nn.n::HUGEINT * i.sk - i.k::HUGEINT * nn.s) AS num,
             nn.n, nn.s
      FROM idx i, nn
    ), best AS (
      SELECT day, k, num, n, s,
             row_number() OVER (ORDER BY num DESC, day) AS rn
      FROM dev
    )
    SELECT n AS n_days, strftime(day, '%Y-%m-%d') AS change_day, k AS change_index,
           CASE WHEN n > 0 AND s > 0 THEN
             {sql_round_big_int_ratio('num', 'n::HUGEINT * s')}
           END AS cusum_sq_stat
    FROM best WHERE rn = 1
    """


@register("stats_cusum_squares_changepoint", oracle=_cusumsq_oracle())
def stats_cusum_squares_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM-of-squares variance changepoint on the daily order-count
    series: D_k = sum_{t<=k} x_t^2 / sum x_t^2 - k/n, argmax |D_k| —
    the VARIANCE-shift detector completing the changepoint family
    (Pettitt finds a level shift, binary segmentation a mean shift,
    Page-Hinkley an online drift; a volatility regime change slips
    past all three and is exactly what D_k peaks on — Brown-Durbin-
    Evans' classic).

    |D_k| maximization never divides: |n*S_k - k*S| shares one
    denominator n*S, so the argmax is over exact integers
    (cross-multiplied), resolved with a deterministic day tiebreak.
    The running sum-of-squares is a broadcast non-equi self-join over
    the ~2.4k-row POST-AGGREGATION calendar table (ljung-box class),
    the final statistic one half-up big-ratio.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    nn = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("x")) * F.col("x")).alias("s"),
    )
    b = daily.select(F.col("day").alias("day_b"), F.col("x").alias("x_b"))
    idx = (
        daily.join(F.broadcast(b), F.col("day_b") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(_dec(F.col("x_b")) * F.col("x_b")).alias("sk"),
        )
    )
    dev = idx.crossJoin(F.broadcast(nn)).select(
        "day",
        "k",
        "n",
        "s",
        F.abs(_dec(F.col("n")) * F.col("sk") - _dec(F.col("k")) * F.col("s")).alias(
            "num"
        ),
    )
    best = dev.agg(
        F.max_by(
            F.struct("day", "k", "num", "n", "s"),
            F.struct(F.col("num"), F.expr("to_unix_timestamp(day) * -1")),
        ).alias("b")
    ).select(
        F.col("b.n").alias("n_days"),
        F.date_format(F.col("b.day"), "yyyy-MM-dd").alias("change_day"),
        F.col("b.k").alias("change_index"),
        F.when(
            (F.col("b.n") > 0) & (F.col("b.s") > 0),
            round_big_int_ratio(F.col("b.num"), _dec(F.col("b.n")) * F.col("b.s")),
        ).alias("cusum_sq_stat"),
    )
    return best


# ---------------------------------------------------------------------------
# 17. LSH band-geometry tuning curve folded over observed similarity
# ---------------------------------------------------------------------------

LSH_TUNE_CONFIGS = ((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))  # r*b = 16
LSH_TUNE_BLOCK_CAP = 64  # deterministic hash-rank sample per block
_LSH_D = 20**16


def _lsh_scurve_rows() -> list:
    """(r, b, bin, p_num) with p = p_num / 20^16 the EXACT collision
    probability 1 - (1 - s^r)^b at the bin's midpoint similarity
    s = (2*bin+1)/20 (bin 10 = exact duplicates, s = 1): Python big
    ints evaluated once and embedded as identical literals in both
    engines — no in-engine power arithmetic to flake."""
    rows = []
    for r, b in LSH_TUNE_CONFIGS:
        for i in range(11):
            if i == 10:
                p_num = _LSH_D
            else:
                m = 2 * i + 1
                p_num = _LSH_D - (20**r - m**r) ** b
            rows.append((r, b, i, p_num))
    return rows


def _lsh_tuning_oracle() -> str:
    from .dedup import _SQL_SHINGLES
    from ..functions.exact import sql_round_big_int_ratio

    vals = ", ".join(
        f"({r}, {b}, {i}, {p}::HUGEINT)" for r, b, i, p in _lsh_scurve_rows()
    )
    LSH_TUNE_BLOCK_CAP = globals()["LSH_TUNE_BLOCK_CAP"]
    return f"""
    WITH norm AS (
{_SQL_SHINGLES}
    ), keyed0 AS (
      SELECT n.doc_id, d.lang, d.n_chars // 100 AS len_bucket,
             list_distinct(list_transform(n.shingles,
               s -> ('0x' || substr(sha256(s), 1, 15))::BIGINT)) AS hs
      FROM norm n JOIN documents d USING (doc_id)
      WHERE len(n.shingles) > 0
    ), keyed AS (
      SELECT doc_id, lang, len_bucket, hs FROM (
        SELECT *, row_number() OVER (PARTITION BY lang, len_bucket
          ORDER BY ('0x' || substr(sha256('tune|' || CAST(doc_id AS VARCHAR)),
                    1, 15))::BIGINT, doc_id) AS rnk
        FROM keyed0
      ) WHERE rnk <= {LSH_TUNE_BLOCK_CAP}
    ), pairs AS (
      SELECT len(list_intersect(a.hs, b.hs)) AS i_sz,
             len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS u_sz
      FROM keyed a JOIN keyed b
        ON a.lang = b.lang AND a.len_bucket = b.len_bucket
           AND a.doc_id < b.doc_id
    ), hist AS (
      SELECT CAST((10 * i_sz) // u_sz AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_b
      FROM pairs WHERE u_sz > 0 GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_b) AS BIGINT) AS n,
             CAST(sum(CASE WHEN bin >= 5 THEN n_b ELSE 0 END) AS BIGINT) AS n_hi
      FROM hist
    ), curve(r, b, bin, p_num) AS (VALUES {vals}),
    folded AS (
      SELECT c.r, c.b,
             CAST(sum(h.n_b::HUGEINT * c.p_num) AS HUGEINT) AS det_num,
             CAST(sum(CASE WHEN h.bin >= 5
                           THEN h.n_b::HUGEINT * c.p_num ELSE 0 END)
                  AS HUGEINT) AS det_hi_num
      FROM curve c JOIN hist h ON h.bin = c.bin
      GROUP BY c.r, c.b
    )
    SELECT CAST(f.r AS BIGINT) AS r, CAST(f.b AS BIGINT) AS b,
           t.n AS n_pairs, t.n_hi AS n_pairs_hi,
           CASE WHEN t.n > 0 THEN
             {sql_round_big_int_ratio('f.det_num', f't.n::HUGEINT * {_LSH_D}')}
           END AS expected_detected,
           CASE WHEN t.n_hi > 0 THEN
             {sql_round_big_int_ratio('f.det_hi_num', f't.n_hi::HUGEINT * {_LSH_D}')}
           END AS expected_detected_hi
    FROM folded f, tot t ORDER BY f.r
    """


@register("dedup_lsh_band_tuning_curve", oracle=_lsh_tuning_oracle())
def dedup_lsh_band_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-geometry tuning: for every (rows-per-band r, bands b)
    split of a 16-hash MinHash signature, the EXPECTED share of
    candidate pairs the banding would surface — the S-curve
    1-(1-s^r)^b folded over the corpus's OBSERVED pair-similarity
    histogram (same blocked shingle-Jaccard pair frame as
    ``dedup_ngram_jaccard``), reported both over all blocked pairs
    and over the true-duplicate band (J >= 0.5). This is the number
    that picks (r, b) before a 100 TB dedup run: the registry's LSH
    recall audits measure ONE deployed geometry after the fact; this
    ranks all of them from one similarity scan.

    The S-curve is exact rational arithmetic with denominator 20^16:
    Python big-int literals embedded identically in both engines (no
    pow() in either plan). Pair similarity bins are exact integer
    deciles ((10*|I|) div |U| — bin>=5 IS J>=0.5 exactly); the fold
    is an 11-row x 5-config broadcast join over the histogram
    aggregate. Same blocking = same bounded pair volume as the
    existing exact-Jaccard path.
    """
    from .dedup import SHINGLE_K, pair_intersections_table
    from ..functions.textnorm import sha256_prefix_i64, whitespace_tokens
    from ..functions.exact import round_big_int_ratio
    from ..functions.partitioning import gated_broadcast

    # Round-14 optimization: the blocked pair set + exact intersection
    # sizes come off the session-materialized
    # ``dedup.pair_intersections_table`` (one derivation, five+
    # consumers); the deterministic per-block cap filters that table
    # through two doc-keyed semi-joins instead of re-hashing shingles
    # and re-joining. The capped doc set is identical: a doc has a
    # non-empty k-shingle set iff it has >= SHINGLE_K whitespace
    # tokens (the UDF emits shingles for i in range(len - k + 1)), and
    # the cap ranking (sha256("tune|"+doc_id), doc_id) never touched
    # the shingles. i_sz/u_sz are the identical integers, so the
    # histogram, the fold, and the oracle are unchanged.
    t = Tables(spark, sf_dir)
    # NOTE (ADVICE r14): this JVM predicate (Java \s = ASCII whitespace)
    # stands in for "the k-shingle UDF output is non-empty" (Python \s =
    # Unicode whitespace). Equivalent on the fixtures' ASCII-whitespace
    # corpora — word_shingles emits max(n-k+1, 0) shingles, so non-empty
    # iff n >= k — but on text containing non-ASCII whitespace the token
    # counts (hence block membership and row_number ranks) could shift;
    # re-derive the capped set from the shingle UDF if such corpora land.
    keyed0 = t.documents.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
    ).filter(F.size(whitespace_tokens(F.col("text"))) >= SHINGLE_K)
    # deterministic per-block cap (the recall-audit mechanism): pair
    # volume <= n_blocks * C(64,2) BY CONSTRUCTION, so the histogram
    # is a bounded hash-sample of blocked pairs at any corpus size
    h = sha256_prefix_i64(
        F.concat(F.lit("tune|"), F.col("doc_id").cast("string"))
    )
    w_cap = Window.partitionBy("lang", "len_bucket").orderBy(
        h.asc(), F.col("doc_id").asc()
    )
    capped = (
        keyed0.withColumn("rnk", F.row_number().over(w_cap))
        .filter(F.col("rnk") <= LSH_TUNE_BLOCK_CAP)
        .select("doc_id")
    )
    inter = F.col("inter")
    union = F.col("sa") + F.col("sb") - inter
    pairs = (
        pair_intersections_table(t)
        .filter(F.col("lb_a") == F.col("lb_b"))
        .join(gated_broadcast(capped.select(F.col("doc_id").alias("doc_a"))), "doc_a", "left_semi")
        .join(gated_broadcast(capped.select(F.col("doc_id").alias("doc_b"))), "doc_b", "left_semi")
        .select(inter.cast("long").alias("i_sz"), union.cast("long").alias("u_sz"))
    )
    hist = (
        pairs.filter(F.col("u_sz") > 0)
        .select(F.expr("(10 * i_sz) div u_sz").cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    tot = hist.agg(
        F.sum("n_b").alias("n"),
        F.sum(F.when(F.col("bin") >= 5, F.col("n_b")).otherwise(0)).alias("n_hi"),
    )
    curve = spark.createDataFrame(
        [(r, b, i, str(p)) for r, b, i, p in _lsh_scurve_rows()],
        "r long, b long, bin long, p_num string",
    ).select("r", "b", "bin", F.col("p_num").cast("decimal(38,0)").alias("p_num"))
    folded = (
        hist.join(F.broadcast(curve), "bin")
        .groupBy("r", "b")
        .agg(
            F.sum(_dec(F.col("n_b")) * F.col("p_num")).alias("det_num"),
            F.sum(
                F.when(F.col("bin") >= 5, _dec(F.col("n_b")) * F.col("p_num")).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("det_hi_num"),
        )
    )
    d_lit = F.lit(str(_LSH_D)).cast("decimal(38,0)")
    return folded.crossJoin(F.broadcast(tot)).select(
        "r",
        "b",
        F.col("n").alias("n_pairs"),
        F.col("n_hi").alias("n_pairs_hi"),
        F.when(
            F.col("n") > 0,
            round_big_int_ratio(F.col("det_num"), _dec(F.col("n")) * d_lit),
        ).alias("expected_detected"),
        F.when(
            F.col("n_hi") > 0,
            round_big_int_ratio(F.col("det_hi_num"), _dec(F.col("n_hi")) * d_lit),
        ).alias("expected_detected_hi"),
    )


# ---------------------------------------------------------------------------
# 18. Mantel-Haenszel common odds ratio across nation strata
# ---------------------------------------------------------------------------

MH_EXPOSED = ("1-URGENT", "2-HIGH")


def _mh_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    exp_in = ", ".join(f"'{p}'" for p in MH_EXPOSED)
    return f"""
    WITH j AS (
      SELECT c.c_nationkey AS blk,
             CASE WHEN o.o_orderpriority IN ({exp_in}) THEN 1 ELSE 0 END AS e,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cells AS (
      SELECT blk,
             CAST(sum(e * y) AS BIGINT) AS a,
             CAST(sum(e * (1 - y)) AS BIGINT) AS b,
             CAST(sum((1 - e) * y) AS BIGINT) AS c,
             CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY blk
    ), terms AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum((a::HUGEINT * d * 1000000) // n) AS HUGEINT) AS sum_ad_q,
             CAST(sum((b::HUGEINT * c * 1000000) // n) AS HUGEINT) AS sum_bc_q
      FROM cells WHERE n > 0
    )
    SELECT n_strata, CAST(sum_ad_q AS BIGINT) AS sum_ad_q,
           CAST(sum_bc_q AS BIGINT) AS sum_bc_q,
           CASE WHEN sum_bc_q > 0 THEN
             {sql_round_big_int_ratio('sum_ad_q', 'sum_bc_q')}
           END AS mh_odds_ratio
    FROM terms
    """


@register("stats_mantel_haenszel_priority_nation", oracle=_mh_oracle())
def stats_mantel_haenszel_priority_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio across nation strata:
    exposure = urgent/high priority, outcome = finished status,
    stratified by customer nation — THE confounder-adjusted 2x2
    association estimator (a crude pooled odds ratio is Simpson's-
    paradox bait when nation sizes and priority mixes differ; MH
    weights each stratum's ad/n and bc/n so only WITHIN-stratum
    contrasts count), completing the association family beside the
    crude odds ratio (Woolf CI) and Cramer's V.

    Deterministic variant: each stratum's ad/n and bc/n term is
    quantized to exact 1e-6 integer units BEFORE summation (floor
    division, identical both engines), so the two sums are exact
    int64 arithmetic and the final ratio one half-up big-ratio — no
    float accumulation order anywhere. One fact-scan aggregate to
    |nations| cells, then a constant-size reduce.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    j = t.orders.select(
        "o_custkey",
        F.col("o_orderpriority").isin(*MH_EXPOSED).cast("int").alias("e"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    ).join(
        t.customer.select(
            F.col("c_custkey").alias("o_custkey"), F.col("c_nationkey").alias("blk")
        ),
        "o_custkey",
    )
    cells = j.groupBy("blk").agg(
        F.sum(F.col("e") * F.col("y")).alias("a"),
        F.sum(F.col("e") * (1 - F.col("y"))).alias("b"),
        F.sum((1 - F.col("e")) * F.col("y")).alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("y"))).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    terms = cells.filter(F.col("n") > 0).agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(
            F.expr("CAST(a AS DECIMAL(38,0)) * d * 1000000 div n").cast("long")
        ).alias("sum_ad_q"),
        F.sum(
            F.expr("CAST(b AS DECIMAL(38,0)) * c * 1000000 div n").cast("long")
        ).alias("sum_bc_q"),
    )
    return terms.select(
        "n_strata",
        "sum_ad_q",
        "sum_bc_q",
        F.when(
            F.col("sum_bc_q") > 0,
            round_big_int_ratio(_dec(F.col("sum_ad_q")), _dec(F.col("sum_bc_q"))),
        ).alias("mh_odds_ratio"),
    )


# ---------------------------------------------------------------------------
# 19. Engagement-class transition matrix across history halves
# ---------------------------------------------------------------------------

RFM_MID_MIN = 30
RFM_HIGH_MIN = 38


def _rfm_class_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} >= {RFM_HIGH_MIN} THEN 'high' "
        f"WHEN {col} >= {RFM_MID_MIN} THEN 'mid' "
        f"WHEN {col} >= 1 THEN 'low' ELSE 'gone' END"
    )


def _rfm_transition_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH bounds AS (
      SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS cut_us FROM events
    ), per AS (
      SELECT e.user_id,
             CAST(sum(CASE WHEN epoch_us(e.ts) < b.cut_us THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(sum(CASE WHEN epoch_us(e.ts) >= b.cut_us THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2
      FROM events e, bounds b
      GROUP BY e.user_id
    ), classed AS (
      SELECT {_rfm_class_sql('n1')} AS class_from,
             {_rfm_class_sql('n2')} AS class_to
      FROM per WHERE n1 >= 1
    ), cells AS (
      SELECT class_from, class_to, CAST(count(*) AS BIGINT) AS n_users
      FROM classed GROUP BY 1, 2
    ), rowtot AS (
      SELECT class_from, CAST(sum(n_users) AS BIGINT) AS n_from
      FROM cells GROUP BY class_from
    )
    SELECT c.class_from, c.class_to, c.n_users, r.n_from,
           {sql_round_int_ratio('c.n_users', 'r.n_from')} AS share
    FROM cells c JOIN rowtot r USING (class_from)
    ORDER BY c.class_from, c.class_to
    """


@register("events_rfm_transition_matrix", oracle=_rfm_transition_oracle())
def events_rfm_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-class transition matrix: users classed by activity
    volume (low 1-29 / mid 30-37 / high 38+ events — the terciles of
    the fixture's stable ~33-events-per-half-window activity) in the FIRST half of
    the observed window, cross-tabulated against their class in the
    second half ('gone' = zero events) — the Markov view of
    engagement the RFM segmentation snapshot
    (``stats_rfm_segmentation``) cannot show: WHERE users move, not
    just where they sit; the share column per source class is the
    empirical transition kernel that churn/upsell models consume.

    The window midpoint is exact integer microsecond arithmetic from
    one global min/max aggregate (broadcast back); both half-counts
    come from ONE user-keyed aggregate with conditional sums (no
    second scan, no window); the matrix is a <= 4x4 final aggregate
    and the shares exact half-up ratios.
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    bounds = t.events.agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2").alias("cut_us")
    )
    per = (
        t.events.select("user_id", F.unix_micros(F.col("ts")).alias("us"))
        .crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("cut_us"), 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("us") >= F.col("cut_us"), 1).otherwise(0)).alias("n2"),
        )
    )

    def cls(col):
        return (
            F.when(F.col(col) >= RFM_HIGH_MIN, "high")
            .when(F.col(col) >= RFM_MID_MIN, "mid")
            .when(F.col(col) >= 1, "low")
            .otherwise("gone")
        )

    classed = per.filter(F.col("n1") >= 1).select(
        cls("n1").alias("class_from"), cls("n2").alias("class_to")
    )
    cells = classed.groupBy("class_from", "class_to").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rowtot = cells.groupBy("class_from").agg(F.sum("n_users").alias("n_from"))
    return cells.join(F.broadcast(rowtot), "class_from").select(
        "class_from",
        "class_to",
        "n_users",
        "n_from",
        round_int_ratio(F.col("n_users"), F.col("n_from")).alias("share"),
    )


# ---------------------------------------------------------------------------
# 20. k-map re-identification risk audit
# ---------------------------------------------------------------------------

KMAP_K = 5


def _kmap_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    k = KMAP_K
    return f"""
    WITH pop AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS p
      FROM customer GROUP BY 1, 2
    ), smp AS (
      SELECT c.c_nationkey AS nat, c.c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS s
      FROM (SELECT DISTINCT o_custkey FROM orders) o
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), cells AS (
      SELECT p.nat, p.seg, p.p, coalesce(s.s, 0) AS s
      FROM pop p LEFT JOIN smp s ON s.nat = p.nat AND s.seg = p.seg
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(s) AS BIGINT) AS n_sample,
             CAST(sum(CASE WHEN p < {k} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_risky_cells,
             CAST(sum(CASE WHEN p < {k} THEN s ELSE 0 END) AS BIGINT)
               AS n_risky_records
      FROM cells
    )
    SELECT CAST({k} AS BIGINT) AS k, n_cells, n_sample, n_risky_cells,
           n_risky_records,
           CASE WHEN n_sample > 0 THEN
             {sql_round_int_ratio('n_risky_records', 'n_sample')}
           END AS risk_share
    FROM agg
    """


@register("privacy_k_map_risk_audit", oracle=_kmap_oracle())
def privacy_k_map_risk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-map re-identification risk: for the released sample (the
    customers who actually appear in orders) under quasi-identifiers
    (nation, segment), count the records whose POPULATION group has
    fewer than k=5 members — the k-map model: k-anonymity judges
    group sizes within the release, k-map against the population an
    attacker actually joins on, which is both the weaker assumption
    and the realistic one when a public register exists. Completes
    the privacy family beside l-diversity / t-closeness (those audit
    the SENSITIVE attribute; this audits identifiability itself).

    One aggregate over the population table, one over the distinct
    sample keys, a |nations| x |segments| cell join, and a
    constant-size reduce — everything integer-exact.
    """
    from ..functions.exact import round_int_ratio

    k = KMAP_K
    t = Tables(spark, sf_dir)
    pop = t.customer.groupBy(
        F.col("c_nationkey").alias("nat"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).alias("p"))
    smp = (
        t.orders.select("o_custkey")
        .distinct()
        .join(
            t.customer.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_nationkey").alias("nat"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "o_custkey",
        )
        .groupBy("nat", "seg")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    cells = pop.join(smp, ["nat", "seg"], "left").select(
        "p", F.coalesce(F.col("s"), F.lit(0)).alias("s")
    )
    agg = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("s").alias("n_sample"),
        F.sum(F.when(F.col("p") < k, 1).otherwise(0)).alias("n_risky_cells"),
        F.sum(F.when(F.col("p") < k, F.col("s")).otherwise(0)).alias(
            "n_risky_records"
        ),
    )
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        "n_cells",
        "n_sample",
        "n_risky_cells",
        "n_risky_records",
        F.when(
            F.col("n_sample") > 0,
            round_int_ratio(F.col("n_risky_records"), F.col("n_sample")),
        ).alias("risk_share"),
    )


# ---------------------------------------------------------------------------
# 21. Cosine-similarity histogram over hash-blocked vector pairs
# ---------------------------------------------------------------------------

COSH_BUCKETS = 64
COSH_BUCKET_CAP = 64  # deterministic hash-rank sample per bucket


def _cosine_hist_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    B = COSH_BUCKETS
    CAP = COSH_BUCKET_CAP
    return f"""
    WITH ranked AS (
      SELECT vec_id, embedding,
             ('0x' || substr(sha256(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
               % {B} AS bkt,
             row_number() OVER (PARTITION BY
               ('0x' || substr(sha256(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % {B}
               ORDER BY ('0x' || substr(sha256('cosh|' || CAST(vec_id AS VARCHAR)),
                         1, 15))::BIGINT, vec_id) AS rnk
      FROM embeddings
    ), vq AS (
      SELECT vec_id, bkt,
             generate_subscripts(embedding, 1) AS pos,
             CAST(floor(unnest(embedding::DOUBLE[]) * 1000000.0 + 0.5) AS BIGINT)
               AS xq
      FROM ranked WHERE rnk <= {CAP}
    ), norms AS (
      SELECT vec_id, CAST(sum(xq * xq) AS BIGINT) AS n2
      FROM vq GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(sum(a.xq * b.xq) AS BIGINT) AS dot
      FROM vq a JOIN vq b
        ON a.bkt = b.bkt AND a.pos = b.pos AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ), cos AS (
      SELECT least(CAST(floor(CAST(d.dot AS DOUBLE)
                        / (sqrt(CAST(na.n2 AS DOUBLE))
                           * sqrt(CAST(nb.n2 AS DOUBLE))) * 10.0) AS BIGINT),
                   9) AS bin
      FROM dots d
      JOIN norms na ON na.vec_id = d.va
      JOIN norms nb ON nb.vec_id = d.vb
      WHERE na.n2 > 0 AND nb.n2 > 0
    ), hist AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs FROM cos GROUP BY bin
    ), tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n FROM hist)
    SELECT h.bin, h.bin / 10.0 AS bin_lo, h.n_pairs,
           {sql_round_int_ratio('h.n_pairs', 't.n')} AS share
    FROM hist h, tot t ORDER BY h.bin
    """


@register("similarity_cosine_pair_histogram", oracle=_cosine_hist_oracle())
def similarity_cosine_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space geometry profile: the distribution of pairwise
    cosine similarity over a deterministic hash-blocked pair sample
    (64 id-hash buckets; pairs within a bucket — n²/B pairs by
    mechanism, every engine and rerun picks the same ones), binned
    into fixed 0.1-wide bins. THE diagnostic read before tuning ANN:
    an anisotropic space (mass piled near +0.4 instead of 0) is
    exactly when LSH hyperplanes lose selectivity and IVF needs more
    cells — the registry's recall audits measure a deployed index;
    this explains WHY the index needs what it needs.

    Spark computes each pair dot product JVM-side with zip_with over
    1e-6-quantized int64 coordinates (exact integer sums — no float
    accumulation order), the oracle by position-explode + integer
    sum; both then evaluate the identical double cos expression and
    fixed floor binning. Per-bucket pair volume scales as (n/B)² —
    B grows with the corpus like every blocking key in the dedup
    family.
    """
    from ..functions.textnorm import sha256_prefix_i64
    from ..functions.exact import round_int_ratio

    B = COSH_BUCKETS
    t = Tables(spark, sf_dir)
    xq = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("long"),
    )
    ranked = t.embeddings.select(
        "vec_id",
        "embedding",
        (sha256_prefix_i64(F.col("vec_id").cast("string")) % B).alias("bkt"),
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("bkt").orderBy(
                sha256_prefix_i64(
                    F.concat(F.lit("cosh|"), F.col("vec_id").cast("string"))
                ).asc(),
                F.col("vec_id").asc(),
            )
        ),
    ).filter(F.col("rnk") <= COSH_BUCKET_CAP)
    vq = ranked.select(
        "vec_id",
        "bkt",
        xq.alias("xq"),
    ).withColumn(
        "n2",
        F.aggregate(
            F.col("xq"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ),
    ).filter(F.col("n2") > 0).localCheckpoint(eager=False)
    a = vq.select(
        F.col("vec_id").alias("va"), "bkt", F.col("xq").alias("xa"),
        F.col("n2").alias("na"),
    )
    b = vq.select(
        F.col("vec_id").alias("vb"), F.col("bkt").alias("bkt_b"),
        F.col("xq").alias("xb"), F.col("n2").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("xa"), F.col("xb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    pairs = (
        a.join(b, (F.col("bkt") == F.col("bkt_b")) & (F.col("va") < F.col("vb")))
        .select(dot.alias("dot"), "na", "nb")
        .select(F.least(F.floor(cos * 10).cast("long"), F.lit(9)).alias("bin"))
    )
    hist = pairs.groupBy("bin").agg(F.count(F.lit(1)).alias("n_pairs"))
    tot = hist.agg(F.sum("n_pairs").alias("n"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "bin",
        (F.col("bin") / 10.0).alias("bin_lo"),
        "n_pairs",
        round_int_ratio(F.col("n_pairs"), F.col("n")).alias("share"),
    )


# ---------------------------------------------------------------------------
# 22. Jensen-Shannon divergence between language unigram distributions
# ---------------------------------------------------------------------------


def _js_lang_oracle() -> str:
    from .corpus import _SQL_TOKENS
    from ..functions.detmath import sql_det_ln_steps
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH toks AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS token FROM documents
    ), cnt AS (
      SELECT lang, token, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY lang, token
    ), sizes AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY lang
    ), pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, a.n AS n_a, b.n AS n_b
      FROM sizes a JOIN sizes b ON a.lang < b.lang
    ), cells AS (
      SELECT p.lang_a, p.lang_b, p.n_a, p.n_b,
             coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
      FROM pairs p
      JOIN (SELECT token FROM cnt GROUP BY token) t ON true
      LEFT JOIN cnt ca ON ca.lang = p.lang_a AND ca.token = t.token
      LEFT JOIN cnt cb ON cb.lang = p.lang_b AND cb.token = t.token
      WHERE coalesce(ca.c, 0) > 0 OR coalesce(cb.c, 0) > 0
    ), args AS (
      SELECT lang_a, lang_b, n_a, n_b, ca, cb,
             CASE WHEN ca > 0 THEN 2 * ca * n_b ELSE NULL END AS arg_pa,
             CASE WHEN cb > 0 THEN 2 * cb * n_a ELSE NULL END AS arg_qb,
             ca * n_b + cb * n_a AS arg_m
      FROM cells
    ), {sql_det_ln_steps('args', 'arg_pa', 'lpa')},
    {sql_det_ln_steps('lpa_rel', 'arg_qb', 'lqb')},
    {sql_det_ln_steps('lqb_rel', 'arg_m', 'lm')},
    terms AS (
      SELECT lang_a, lang_b, n_a, n_b,
             CAST(sum(CASE WHEN ca > 0 THEN ca::HUGEINT * (lpa - lm) ELSE 0 END)
                  AS HUGEINT) AS a_sum,
             CAST(sum(CASE WHEN cb > 0 THEN cb::HUGEINT * (lqb - lm) ELSE 0 END)
                  AS HUGEINT) AS b_sum
      FROM lm_rel GROUP BY lang_a, lang_b, n_a, n_b
    )
    SELECT lang_a, lang_b, n_a AS n_tokens_a, n_b AS n_tokens_b,
           {sql_round_big_int_ratio(
               'a_sum * n_b + b_sum * n_a',
               '2::HUGEINT * n_a * n_b * 1000000')} AS js_divergence
    FROM terms ORDER BY lang_a, lang_b
    """


@register("text_unigram_js_lang_pairs", oracle=_js_lang_oracle())
def text_unigram_js_lang_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between language unigram
    DISTRIBUTIONS: JS(P,Q) = (KL(P||M) + KL(Q||M))/2 at M = (P+Q)/2 —
    the distributional sibling of ``text_lang_vocab_jaccard`` (that
    one asks which words exist; this asks how MASS differs — two
    corpora can share a vocabulary yet weight it incomparably, which
    is what mixture-weight design actually cares about).

    Every log runs through the det-ln fixed-point chain on exact
    integer ratios: p/m = 2*c_a*n_b / (c_a*n_b + c_b*n_a), so each
    term is c_a * (ln-units integer difference); the per-pair sums
    are exact int64 in 1e-6 nat units and the final JS one half-up
    big-ratio. Zero-count sides contribute zero exactly (their
    KL terms vanish by continuity — the CASE guards match the
    convention in both engines). Work is |pairs| x |union vocab| —
    vocabulary-bounded, not row-bounded, like every text-family op.
    """
    from ..functions.detmath import det_ln_q
    from ..functions.exact import round_big_int_ratio
    from ..functions.textnorm import whitespace_tokens

    t = Tables(spark, sf_dir)
    cnt = (
        t.documents.select(
            "lang", F.explode(whitespace_tokens(F.col("text"))).alias("token")
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    sizes = cnt.groupBy("lang").agg(F.sum("c").alias("n"))
    pairs = sizes.select(
        F.col("lang").alias("lang_a"), F.col("n").alias("n_a")
    ).join(
        F.broadcast(
            sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_b"))
        ),
        F.col("lang_a") < F.col("lang_b"),
    )
    # per (pair, token) counts via two left joins from the
    # pair x token spine — vocabulary-bounded: |union vocab| x |pairs|
    spine = pairs.crossJoin(
        F.broadcast(cnt.select("token").distinct())
    )
    cells = (
        spine.join(
            cnt.select(
                F.col("lang").alias("lang_a"), "token", F.col("c").alias("ca")
            ),
            ["lang_a", "token"],
            "left",
        )
        .join(
            cnt.select(
                F.col("lang").alias("lang_b"), "token", F.col("c").alias("cb")
            ),
            ["lang_b", "token"],
            "left",
        )
        .select(
            "lang_a", "lang_b", "n_a", "n_b",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
        .filter((F.col("ca") > 0) | (F.col("cb") > 0))
    )
    lpa = det_ln_q((2 * F.col("ca") * F.col("n_b")).cast("double"))
    lqb = det_ln_q((2 * F.col("cb") * F.col("n_a")).cast("double"))
    lm = det_ln_q((F.col("ca") * F.col("n_b") + F.col("cb") * F.col("n_a")).cast("double"))
    terms = cells.select(
        "lang_a", "lang_b", "n_a", "n_b",
        F.when(F.col("ca") > 0, _dec(F.col("ca")) * (lpa - lm))
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("ta"),
        F.when(F.col("cb") > 0, _dec(F.col("cb")) * (lqb - lm))
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("tb"),
    ).groupBy("lang_a", "lang_b", "n_a", "n_b").agg(
        F.sum("ta").alias("a_sum"), F.sum("tb").alias("b_sum")
    )
    return terms.select(
        "lang_a",
        "lang_b",
        F.col("n_a").alias("n_tokens_a"),
        F.col("n_b").alias("n_tokens_b"),
        round_big_int_ratio(
            F.col("a_sum") * F.col("n_b") + F.col("b_sum") * F.col("n_a"),
            F.lit(2).cast("decimal(38,0)") * F.col("n_a") * F.col("n_b") * 1000000,
        ).alias("js_divergence"),
    )


# ---------------------------------------------------------------------------
# 23. Exact randomization (permutation) test for the A/B value gap
# ---------------------------------------------------------------------------

PERM_B = 64


def _perm_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio, sql_round_int_ratio

    B = PERM_B
    return f"""
    WITH ux AS (
      SELECT user_id,
             CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS x
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), obs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END) AS HUGEINT) AS sa,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN x ELSE 0 END) AS HUGEINT) AS sb
      FROM ux
    ), perms AS (
      SELECT s.b,
             CAST(sum(CASE WHEN s.g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN s.g = 0 THEN s.x ELSE 0 END) AS HUGEINT) AS sa,
             CAST(sum(CASE WHEN s.g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN s.g = 1 THEN s.x ELSE 0 END) AS HUGEINT) AS sb
      FROM (
        SELECT u.user_id, u.x, bb.b,
               (('0x' || substr(sha256('perm' || CAST(bb.b AS VARCHAR) || '|'
                 || CAST(u.user_id AS VARCHAR)), 1, 15))::BIGINT % 2) AS g
        FROM ux u, (SELECT unnest(range(0, {B})) AS b) bb
      ) s
      GROUP BY s.b
    ), cmp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exceed
      FROM perms p, obs o
      WHERE p.na > 0 AND p.nb > 0
        AND abs(p.sa * p.nb - p.sb * p.na) * (o.na::HUGEINT * o.nb)
            >= abs(o.sa * o.nb - o.sb * o.na) * (p.na::HUGEINT * p.nb)
    )
    SELECT o.n_users, CAST({B} AS BIGINT) AS n_perms,
           CASE WHEN o.na > 0 AND o.nb > 0 THEN
             {sql_round_big_int_ratio(
                 'o.sa * o.nb - o.sb * o.na',
                 'o.na::HUGEINT * o.nb * 1000000')}
           END AS mean_diff_obs,
           {sql_round_int_ratio('1 + c.n_exceed', f'{B} + 1')} AS p_value
    FROM obs o, cmp c
    """


@register("stats_permutation_test_ab", oracle=_perm_oracle())
def stats_permutation_test_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact randomization test for the A/B purchase-value gap:
    64 deterministic salted-hash relabelings of the user-level spend
    totals, p = (1 + #{|T_perm| >= |T_obs|}) / 65 — the
    assumption-free inference the t-test family approximates (Welch
    assumes normal-ish sampling distributions; the randomization test
    IS the null distribution, and hash-derived labelings make it
    RNG-free and bit-reproducible on every engine and rerun).

    One user-keyed aggregate produces the spend totals; the 64
    relabelings are a broadcast 64-row grid crossed against that
    AGGREGATE (64x|users| rows, never 64x raw events); each
    permutation reduces to 4 integers, and every |T_b| >= |T_obs|
    comparison is cross-multiplied exact decimal arithmetic (valid to
    ~1e6 users before decimal38 would saturate — beyond that the
    comparison drops to the deterministic double cast of the same
    exact integers).
    """
    from ..functions.exact import round_big_int_ratio, round_int_ratio
    from ..functions.textnorm import sha256_prefix_i64

    B = PERM_B
    t = Tables(spark, sf_dir)
    ux = (
        t.events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("xv"),
        )
        .groupBy("user_id")
        .agg(F.sum("xv").alias("x"))
        .localCheckpoint(eager=False)
    )
    obs = ux.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("user_id") % 2 == 0, _dec(F.col("x"))).otherwise(
            F.lit(0).cast("decimal(38,0)"))).alias("sa"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("user_id") % 2 == 1, _dec(F.col("x"))).otherwise(
            F.lit(0).cast("decimal(38,0)"))).alias("sb"),
    )
    bs = spark.range(B).select(F.col("id").alias("b"))
    g = (
        sha256_prefix_i64(
            F.concat(
                F.lit("perm"), F.col("b").cast("string"), F.lit("|"),
                F.col("user_id").cast("string"),
            )
        )
        % 2
    )
    perms = (
        ux.crossJoin(F.broadcast(bs))
        .select("b", "x", g.alias("g"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("g") == 0, _dec(F.col("x"))).otherwise(
                F.lit(0).cast("decimal(38,0)"))).alias("sa"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("nb"),
            F.sum(F.when(F.col("g") == 1, _dec(F.col("x"))).otherwise(
                F.lit(0).cast("decimal(38,0)"))).alias("sb"),
        )
    )
    o = F.broadcast(obs.select(
        F.col("na").alias("o_na"), F.col("sa").alias("o_sa"),
        F.col("nb").alias("o_nb"), F.col("sb").alias("o_sb"),
    ))
    cmp = (
        perms.crossJoin(o)
        .filter(
            (F.col("na") > 0) & (F.col("nb") > 0)
            & (
                F.abs(F.col("sa") * F.col("nb") - F.col("sb") * F.col("na"))
                * (_dec(F.col("o_na")) * F.col("o_nb"))
                >= F.abs(
                    F.col("o_sa") * F.col("o_nb") - F.col("o_sb") * F.col("o_na")
                )
                * (_dec(F.col("na")) * F.col("nb"))
            )
        )
        .agg(F.count(F.lit(1)).alias("n_exceed"))
    )
    return obs.crossJoin(F.broadcast(cmp)).select(
        "n_users",
        F.lit(B).cast("long").alias("n_perms"),
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            round_big_int_ratio(
                F.col("sa") * F.col("nb") - F.col("sb") * F.col("na"),
                _dec(F.col("na")) * F.col("nb") * 1000000,
            ),
        ).alias("mean_diff_obs"),
        round_int_ratio(F.lit(1) + F.col("n_exceed"), F.lit(B + 1)).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# 24. KMV/theta set-DIFFERENCE estimate: heavy viewers minus purchasers
# ---------------------------------------------------------------------------

KMV_DIFF_MIN = 10


def _kmv_difference_oracle() -> str:
    from .roundnine import KMV_INT_DOMAIN, KMV_INT_K
    from ..functions.exact import sql_round_int_ratio

    k, dom, thr = KMV_INT_K, KMV_INT_DOMAIN, KMV_DIFF_MIN
    return f"""
    WITH pv AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nv,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS np
      FROM events GROUP BY user_id
    ), h AS (
      SELECT user_id,
             (('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 15)))::BIGINT
               AS hv,
             nv >= {thr} AS in_a, np >= {thr} AS in_b
      FROM pv WHERE nv >= {thr} OR np >= {thr}
    ), ha AS (SELECT hv FROM h WHERE in_a),
    hb AS (SELECT hv FROM h WHERE in_b),
    hu AS (SELECT hv FROM ha UNION SELECT hv FROM hb),
    theta AS (
      SELECT CAST(max(hv) AS BIGINT) AS th,
             CAST(count(*) AS BIGINT) AS k_eff
      FROM (SELECT hv FROM hu ORDER BY hv LIMIT {k})
    ), a_under AS (
      SELECT CAST(count(*) AS BIGINT) AS n_a
      FROM ha, theta WHERE hv <= theta.th
    ), common AS (
      SELECT CAST(count(*) AS BIGINT) AS c
      FROM ha JOIN hb USING (hv), theta
      WHERE hv <= theta.th
    ), tru AS (
      SELECT CAST(count(*) AS BIGINT) AS d_true
      FROM h WHERE in_a AND NOT in_b
    )
    SELECT t.k_eff, t.th AS theta,
           a.n_a - c.c AS n_diff_under_theta,
           CAST(CASE WHEN t.k_eff = {k}
                THEN ((a.n_a - c.c)::HUGEINT * {k - 1} * {dom})
                     // ({k}::HUGEINT * t.th)
                ELSE a.n_a - c.c END AS BIGINT) AS d_diff_est,
           u.d_true,
           CASE WHEN u.d_true > 0 THEN {sql_round_int_ratio(
               f'''abs(CAST(CASE WHEN t.k_eff = {k}
                    THEN ((a.n_a - c.c)::HUGEINT * {k - 1} * {dom})
                         // ({k}::HUGEINT * t.th)
                    ELSE a.n_a - c.c END AS BIGINT) - u.d_true)''',
               'u.d_true')} END AS rel_error
    FROM theta t, a_under a, common c, tru u
    """


@register("sketch_kmv_difference_users", oracle=_kmv_difference_oracle())
def sketch_kmv_difference_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta set-DIFFERENCE estimate |heavy viewers \\ heavy
    purchasers| (activity >= 10 events of the type — behaviorally
    distinct sets whose difference is the "browses a lot, never
    converts" audience): under the union's theta threshold,
    difference membership is EXACT on the sampled hashes (in A, not
    in B), and the same inverse-theta scale-up as the intersection
    estimator extrapolates it — the third theta-sketch set-algebra
    member (distinct, intersection, difference). Audited against the
    exact difference with relative error like every sketch in the
    registry.

    Same bottom-k machinery as ``sketch_kmv_intersection_users``:
    per-set membership from ONE user-keyed aggregate, union bottom-256
    theta (a 256-row TakeOrdered), broadcast threshold probes, exact
    integer scale-up. Mergeable by construction (theta sketches
    compose by min-theta + hash union).
    """
    from .roundnine import KMV_INT_DOMAIN, KMV_INT_K
    from ..functions.exact import round_int_ratio
    from ..functions.textnorm import sha256_prefix_i64

    k, dom, thr = KMV_INT_K, KMV_INT_DOMAIN, KMV_DIFF_MIN
    t = Tables(spark, sf_dir)
    pv = t.events.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nv"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np"),
    )
    h = (
        pv.filter((F.col("nv") >= thr) | (F.col("np") >= thr))
        .select(
            sha256_prefix_i64(F.col("user_id").cast("string")).alias("hv"),
            (F.col("nv") >= thr).alias("in_a"),
            (F.col("np") >= thr).alias("in_b"),
        )
        .localCheckpoint(eager=False)
    )
    ha = h.filter(F.col("in_a")).select("hv")
    hb = h.filter(F.col("in_b")).select("hv")
    hu = ha.union(hb).distinct()
    theta = (
        hu.orderBy("hv")
        .limit(k)
        .agg(F.max("hv").alias("th"), F.count(F.lit(1)).alias("k_eff"))
    )
    a_under = ha.crossJoin(F.broadcast(theta)).filter(
        F.col("hv") <= F.col("th")
    ).agg(F.count(F.lit(1)).alias("n_a"))
    common = (
        ha.join(hb, "hv")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("hv") <= F.col("th"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tru = h.filter(F.col("in_a") & ~F.col("in_b")).agg(
        F.count(F.lit(1)).alias("d_true")
    )
    out = (
        theta.crossJoin(F.broadcast(a_under))
        .crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(tru))
    )
    est = F.when(
        F.col("k_eff") == k,
        F.expr(
            f"CAST((CAST(n_a - c AS DECIMAL(38,0)) * {k - 1} * {dom})"
            f" div (CAST({k} AS DECIMAL(38,0)) * th) AS BIGINT)"
        ),
    ).otherwise(F.col("n_a") - F.col("c"))
    return out.select(
        "k_eff",
        F.col("th").alias("theta"),
        (F.col("n_a") - F.col("c")).alias("n_diff_under_theta"),
        est.alias("d_diff_est"),
        "d_true",
        F.when(
            F.col("d_true") > 0,
            round_int_ratio(F.abs(est - F.col("d_true")), F.col("d_true")),
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# 25. Nearest-event as-of attribution (purchase -> closest view)
# ---------------------------------------------------------------------------

ASOF_NEAR_EDGES_MIN = (1, 5, 30, 120, 1440)  # minutes; last bucket = beyond


def _asof_near_bucket_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN {col} < {m}::BIGINT * 60000000 THEN {i}"
        for i, m in enumerate(ASOF_NEAR_EDGES_MIN)
    )
    return f"CASE {cases} ELSE {len(ASOF_NEAR_EDGES_MIN)} END"


def _asof_nearest_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH p AS (
      SELECT user_id, event_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'view'
    ), nearest AS (
      SELECT p.user_id, p.event_id,
             min(abs(p.us - v.us)) AS gap_us
      FROM p JOIN v USING (user_id)
      GROUP BY p.user_id, p.event_id
    ), bucketed AS (
      SELECT CAST({_asof_near_bucket_sql('gap_us')} AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_purchases
      FROM nearest GROUP BY 1
    ), tot AS (SELECT CAST(sum(n_purchases) AS BIGINT) AS t FROM bucketed)
    SELECT b.bucket, b.n_purchases,
           {sql_round_int_ratio('b.n_purchases', 't.t')} AS share
    FROM bucketed b, tot t ORDER BY b.bucket
    """


@register("events_asof_nearest_attribution", oracle=_asof_nearest_oracle())
def events_asof_nearest_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of attribution: for every purchase, the
    time gap to the user's CLOSEST view in either direction, bucketed
    into a fixed minute ladder (<1m / <5m / <30m / <2h / <1d /
    beyond) — the NEAREST-direction member of the as-of join family
    (``events_scd_asof_snapshot`` is backward-only; last-touch
    attribution is backward with a horizon; "nearest" is the
    symmetric variant ad-attribution models use when view logs and
    purchase logs have clock skew in either direction).

    The nearest gap per purchase is a user-keyed equi-join between
    the two PER-USER event subsets (pair volume bounded by per-user
    activity squared — the sessionization family's standing
    assumption, not data-scaled), reduced by a (user, purchase)
    min aggregate; the histogram is a literal CASE ladder, <= 6 rows
    out, shares exact half-up ratios.
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    p = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us_p")
    )
    v = t.events.filter(F.col("event_type") == "view").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us_v")
    )
    nearest = (
        p.join(v, "user_id")
        .groupBy("user_id", "event_id")
        .agg(F.min(F.abs(F.col("us_p") - F.col("us_v"))).alias("gap_us"))
    )
    bucket = F.when(F.col("gap_us") < ASOF_NEAR_EDGES_MIN[0] * 60_000_000, 0)
    for i, m in enumerate(ASOF_NEAR_EDGES_MIN[1:], start=1):
        bucket = bucket.when(F.col("gap_us") < m * 60_000_000, i)
    bucket = bucket.otherwise(len(ASOF_NEAR_EDGES_MIN)).cast("long")
    bucketed = nearest.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )
    tot = bucketed.agg(F.sum("n_purchases").alias("t"))
    return bucketed.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_purchases",
        round_int_ratio(F.col("n_purchases"), F.col("t")).alias("share"),
    )
