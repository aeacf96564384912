"""Round-6 operator batch.

New analytics surface on top of the established exactness toolkit:
integer/decimal half-up ratios (functions/exact.py) and the
deterministic fixed-point ln (functions/detmath.py) added this round —
several of these operators exist specifically because det-ln makes
their log-based statistics hash-exact across engines for the first
time (naive Bayes, Zipf fit, deterministic Laplace noise).

Every operator is registered directly (@register): the evidence
backlog is zero, so the driver window has room for the whole batch
(see registry._DRIVER_WINDOW_PRIORITY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import Tables

_P = 2_147_483_647  # Mersenne prime for the portable uniform hash


def _dec(c):
    return c.cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# 1. Kolmogorov-Smirnov two-sample test (A/B on full distributions)
# ---------------------------------------------------------------------------


def _ks_oracle() -> str:
    return """
    WITH q AS (
      SELECT event_type, user_id % 2 AS cohort,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_u
      FROM events
    ), g AS (
      SELECT event_type, v_u,
             CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM q GROUP BY event_type, v_u
    ), c AS (
      SELECT event_type, v_u,
             sum(ca) OVER (PARTITION BY event_type ORDER BY v_u) AS cum_a,
             sum(cb) OVER (PARTITION BY event_type ORDER BY v_u) AS cum_b
      FROM g
    ), tot AS (
      SELECT event_type,
             CAST(max(cum_a) AS BIGINT) AS n_a,
             CAST(max(cum_b) AS BIGINT) AS n_b
      FROM c GROUP BY event_type
    ), d AS (
      SELECT c.event_type, t.n_a, t.n_b,
             max(abs(CAST(cum_a AS HUGEINT) * t.n_b
                     - CAST(cum_b AS HUGEINT) * t.n_a)) AS d_num
      FROM c JOIN tot t USING (event_type)
      GROUP BY c.event_type, t.n_a, t.n_b
    )
    SELECT event_type, n_a, n_b,
           CAST(((2000000::HUGEINT * d_num + (n_a::HUGEINT * n_b))
                 // (2::HUGEINT * n_a * n_b)) AS BIGINT) / 1000000.0 AS ks_stat
    FROM d
    """


@register("stats_ks_two_sample", oracle=_ks_oracle())
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per event type
    between the even/odd user cohorts — the distribution-level A/B
    test (t-test compares means; KS catches shape drift anywhere in
    the CDF).

    Exactness: values quantize to micro-units; the statistic is
    max |F_a - F_b| evaluated only at the DISTINCT quantized values,
    with the CDF difference cross-multiplied to the integer
    |cum_a * n_b - cum_b * n_a| — no division until one final
    decimal-domain half-up ratio by n_a * n_b (cents-scale-proof per
    the round_big_int_ratio discipline).

    Scale: one partial-aggregated groupBy on (event_type, value), one
    bounded per-type ordered window over the distinct-value domain,
    and a |event_types|-row reduce. No row-level sort of the raw
    corpus — the window runs on the collapsed value histogram.
    """
    from ..functions.exact import quantize, round_big_int_ratio

    t = Tables(spark, sf_dir)
    q = t.events.select(
        "event_type",
        (F.col("user_id") % 2).alias("cohort"),
        quantize(F.col("value"), 6).alias("v_u"),
    )
    g = q.groupBy("event_type", "v_u").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("cb"),
    )
    w = Window.partitionBy("event_type").orderBy("v_u")
    c = g.select(
        "event_type",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = c.groupBy("event_type").agg(
        F.max("cum_a").alias("n_a"), F.max("cum_b").alias("n_b")
    )
    d = (
        c.join(tot, "event_type")
        .groupBy("event_type", "n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    _dec(F.col("cum_a")) * _dec(F.col("n_b"))
                    - _dec(F.col("cum_b")) * _dec(F.col("n_a"))
                )
            ).alias("d_num")
        )
    )
    return d.select(
        "event_type",
        "n_a",
        "n_b",
        round_big_int_ratio(
            F.col("d_num"), _dec(F.col("n_a")) * _dec(F.col("n_b"))
        ).alias("ks_stat"),
    )


# ---------------------------------------------------------------------------
# 2. Wilson score interval for proportions (companion to the z-test)
# ---------------------------------------------------------------------------

WILSON_Z = 1.96  # 95% two-sided


def _wilson_oracle() -> str:
    z2 = f"({WILSON_Z!r}::DOUBLE * {WILSON_Z!r}::DOUBLE)"
    return f"""
    WITH base AS (
      SELECT c.c_nationkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ), w AS (
      SELECT c_nationkey, n, k,
             CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             {z2} / CAST(n AS DOUBLE) AS zn
      FROM base
    ), parts AS (
      SELECT c_nationkey, n, k,
             (p + zn * 0.5) / (1.0 + zn) AS center,
             ({WILSON_Z!r}::DOUBLE * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                                          + zn * 0.25 / CAST(n AS DOUBLE)))
               / (1.0 + zn) AS halfwidth
      FROM w
    )
    SELECT nn.n_name AS nation, n AS n_orders, k AS n_urgent,
           CAST(floor(center * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
             AS wilson_center,
           CAST(floor((center - halfwidth) * 1000000.0 + 0.5) AS BIGINT)
             / 1000000.0 AS ci_lo,
           CAST(floor((center + halfwidth) * 1000000.0 + 0.5) AS BIGINT)
             / 1000000.0 AS ci_hi
    FROM parts JOIN nation nn ON nn.n_nationkey = parts.c_nationkey
    """


@register("stats_wilson_ci_by_nation", oracle=_wilson_oracle())
def stats_wilson_ci_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the urgent-order rate
    per nation — the proportion CI that stays inside [0,1] and behaves
    at small n, complementing ``stats_proportions_ztest`` (which tests
    a difference; this bounds a level).

    Cross-engine exactness without integer gymnastics: the Wilson
    formula is +-*/sqrt only — every one of those is IEEE
    correctly-rounded on both engines — so mirroring the association
    order (and ::DOUBLE-casting the z constant, which DuckDB would
    otherwise parse as DECIMAL) makes the doubles bit-identical before
    the one micro-unit quantization. Scale: one partial-aggregated
    fact groupBy; everything downstream is |nations| rows.
    """
    t = Tables(spark, sf_dir)
    base = (
        t.orders.join(
            t.customer.select("c_custkey", "c_nationkey"),
            t.orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("k"),
        )
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    zn = F.lit(WILSON_Z * WILSON_Z) / nd
    center = (p + zn * F.lit(0.5)) / (F.lit(1.0) + zn)
    halfwidth = (
        F.lit(WILSON_Z)
        * F.sqrt(p * (F.lit(1.0) - p) / nd + zn * F.lit(0.25) / nd)
    ) / (F.lit(1.0) + zn)
    q6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long") / F.lit(1e6)  # noqa: E731
    return (
        base.join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            base.c_nationkey == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_orders"),
            F.col("k").alias("n_urgent"),
            q6(center).alias("wilson_center"),
            q6(center - halfwidth).alias("ci_lo"),
            q6(center + halfwidth).alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# 3. t-closeness audit (privacy family: k-anonymity -> l-diversity -> this)
# ---------------------------------------------------------------------------

TCLOSE_BUCKET = 500   # n_chars quasi-identifier bucket width (matches l-div)
TCLOSE_T_PPM = 350_000  # t = 0.35 threshold, in ppm


def _tclose_oracle() -> str:
    return f"""
    WITH docs AS (
      SELECT lang, CAST(n_chars // {TCLOSE_BUCKET} AS BIGINT) AS len_bucket, source
      FROM documents
    ), gsrc AS (
      SELECT source, CAST(count(*) AS BIGINT) AS cs FROM docs GROUP BY source
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM docs),
    grp AS (
      SELECT lang, len_bucket, source, CAST(count(*) AS BIGINT) AS c
      FROM docs GROUP BY 1, 2, 3
    ), gsize AS (
      SELECT lang, len_bucket, CAST(sum(c) AS BIGINT) AS ng
      FROM grp GROUP BY 1, 2
    ), terms AS (
      -- every (group, source) pair, including sources absent from the
      -- group (c = 0), so the variation distance sums the full domain
      SELECT gs.lang, gs.len_bucket, gs.ng, n.big_n,
             abs(coalesce(g.c, 0)::HUGEINT * n.big_n - gl.cs::HUGEINT * gs.ng)
               AS num
      FROM gsize gs
      CROSS JOIN gsrc gl
      CROSS JOIN n
      LEFT JOIN grp g ON g.lang = gs.lang AND g.len_bucket = gs.len_bucket
                      AND g.source = gl.source
    ), tv AS (
      SELECT lang, len_bucket, ng,
             CAST(((2000000::HUGEINT * sum(num) + (2::HUGEINT * max(ng) * max(big_n)))
                   // (2::HUGEINT * 2 * max(ng) * max(big_n))) AS BIGINT) AS tv_ppm
      FROM terms GROUP BY 1, 2, 3
    )
    SELECT lang, len_bucket, ng AS group_size,
           tv_ppm / 1000000.0 AS tv_distance,
           (tv_ppm <= {TCLOSE_T_PPM}) AS meets_t
    FROM tv
    """


@register("privacy_t_closeness_audit", oracle=_tclose_oracle())
def privacy_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the quasi-identifier (lang, length
    bucket): the distance between each QI group's sensitive-attribute
    distribution (source) and the GLOBAL distribution, as total
    variation distance — the third rung of the anonymity ladder
    (k-anonymity bounds group size, l-diversity bounds variety, this
    bounds how much a group's distribution LEAKS relative to baseline).

    Exactness: TV = sum |c/ng - C/N| / 2 is cross-multiplied to the
    integer sum |c*N - C*ng| and divided once in the decimal domain
    (half-up ppm). The group x source grid joins the bounded source
    domain, so absent sources contribute their full |0 - C*ng| mass.
    Scale: two partial-aggregated counts plus a |groups| x |sources|
    grid — both domain-bounded, never corpus-bounded.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    docs = t.documents.select(
        "lang",
        (F.col("n_chars") / F.lit(TCLOSE_BUCKET)).cast("long").alias("len_bucket"),
        "source",
    )
    glob = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cs"))
    big_n = docs.agg(F.count(F.lit(1)).alias("big_n"))
    grp = docs.groupBy("lang", "len_bucket", "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    gsize = grp.groupBy("lang", "len_bucket").agg(F.sum("c").alias("ng"))
    terms = (
        gsize.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(big_n))
        .join(grp, ["lang", "len_bucket", "source"], "left")
        .select(
            "lang",
            "len_bucket",
            "ng",
            "big_n",
            F.abs(
                _dec(F.coalesce(F.col("c"), F.lit(0))) * _dec(F.col("big_n"))
                - _dec(F.col("cs")) * _dec(F.col("ng"))
            ).alias("num"),
        )
    )
    tv = terms.groupBy("lang", "len_bucket", "ng").agg(
        F.sum("num").alias("sum_num"),
        F.max("big_n").alias("big_n"),
    )
    tv_ppm = round_big_int_ratio(
        F.col("sum_num"),
        F.lit(2).cast("decimal(38,0)") * _dec(F.col("ng")) * _dec(F.col("big_n")),
    ) * F.lit(1e6)
    return tv.select(
        "lang",
        "len_bucket",
        F.col("ng").alias("group_size"),
        (F.floor(tv_ppm + F.lit(0.5)).cast("long") / F.lit(1e6)).alias("tv_distance"),
        (F.floor(tv_ppm + F.lit(0.5)).cast("long") <= F.lit(TCLOSE_T_PPM)).alias(
            "meets_t"
        ),
    )


# ---------------------------------------------------------------------------
# 4. Autocorrelation of the daily activity series (lags 1..7)
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7


def _acf_oracle() -> str:
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS s
      FROM daily
    ), cent AS (
      SELECT event_type, i, n,
             n::HUGEINT * y - s::HUGEINT AS z
      FROM idx
    ), lags AS (
      SELECT l FROM unnest(range(1, {ACF_MAX_LAG + 1})) AS t(l)
    ), num AS (
      SELECT a.event_type, l.l AS lag, a.n,
             sum(a.z * b.z) AS num
      FROM cent a
      JOIN lags l ON true
      JOIN cent b ON b.event_type = a.event_type AND b.i = a.i + l.l
      GROUP BY 1, 2, 3
    ), den AS (
      SELECT event_type, sum(z * z) AS den FROM cent GROUP BY event_type
    )
    SELECT n.event_type, n.lag, n.n AS n_days,
           CAST(CASE WHEN n.num >= 0
             THEN  ((2000000::HUGEINT * n.num + d.den) // (2::HUGEINT * d.den))
             ELSE -((2000000::HUGEINT * (-n.num) + d.den) // (2::HUGEINT * d.den))
           END AS BIGINT) / 1000000.0 AS acf
    FROM num n JOIN den d USING (event_type)
    """


@register("events_acf_daily_lags", oracle=_acf_oracle())
def events_acf_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7,
    per event type — the seasonality detector (a weekly cycle shows as
    a lag-7 peak) feeding forecasting and anomaly baselines.

    Exactness: with the series mean-centered by cross-multiplication
    (z_t = n*y_t - S, integers — no fractional mean anywhere), the ACF
    is sum(z_t * z_{t+l}) / sum(z_t^2), two exact decimal sums and one
    half-up ratio. Scale: the raw corpus collapses to a
    |event_types| x |days| series in one partial-aggregated groupBy;
    lag pairing is a self-join on the day index of that BOUNDED series
    (days grow with time, not with data volume), broadcastable at any
    corpus size.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    daily = (
        t.events.select("event_type", F.to_date("ts").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "y",
        F.row_number().over(w.orderBy("d")).alias("i"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("y").over(w).alias("s"),
    )
    cent = idx.select(
        "event_type",
        "i",
        "n",
        (_dec(F.col("n")) * _dec(F.col("y")) - _dec(F.col("s"))).alias("z"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    b = cent.select(
        F.col("event_type").alias("et_b"), F.col("i").alias("i_b"), F.col("z").alias("z_b")
    )
    num = (
        cent.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("i_b") == F.col("i") + F.col("lag")),
        )
        .groupBy("event_type", "lag", "n")
        .agg(F.sum(F.col("z") * F.col("z_b")).alias("num"))
    )
    den = cent.groupBy("event_type").agg(F.sum(F.col("z") * F.col("z")).alias("den"))
    return (
        num.join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            "lag",
            F.col("n").alias("n_days"),
            round_big_int_ratio(F.col("num"), F.col("den")).alias("acf"),
        )
    )


# ---------------------------------------------------------------------------
# 5. k-core peeling (graph family: degree -> triangles -> PR -> LPA -> this)
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    from .graph import _SQL_EDGES

    # MATERIALIZED is load-bearing: without it DuckDB re-derives each
    # round's CTE per reference and the unrolled chain recomputes
    # multiplicatively (measured 14.9s -> sub-second at sf0.01)
    sql = _SQL_EDGES + """
    , e0 AS MATERIALIZED (SELECT u, v FROM edges)"""
    prev = "e0"
    for r in range(1, KCORE_ROUNDS + 1):
        sql += f"""
    , d{r} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, count(*) AS deg
        FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
        GROUP BY node) WHERE deg >= {KCORE_K}
    ), e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM {prev} e
      JOIN d{r} a ON a.node = e.u
      JOIN d{r} b ON b.node = e.v
    )"""
        prev = f"e{r}"
    parts = []
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f"""
      SELECT CAST({r} AS BIGINT) AS round,
             (SELECT CAST(count(*) AS BIGINT)
              FROM (SELECT u AS node FROM e{r} UNION SELECT v FROM e{r}))
               AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges"""
        )
    sql += """
    SELECT * FROM ("""
    sql += " UNION ALL ".join(parts)
    sql += """
    )
    """
    return sql


@register("graph_kcore_membership", oracle=_kcore_oracle())
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-core peeling (k=3, 3 synchronous rounds) over the
    co-purchase graph: repeatedly remove nodes of degree < k and the
    edges they carry, reporting surviving node/edge counts per round —
    the standard dense-subgraph extractor (spam rings, core
    communities), and the graph family's fourth iterative member after
    PageRank / connected components / label propagation.

    Each round is one degree aggregation over the current edge set plus
    two semi-joins against the surviving-node table — the same
    bounded-iteration declarative shape as LPA, localCheckpointed per
    round so round R is one join, not an R-deep recompute. The fixed
    round count makes the operator's semantics (and its unrolled-CTE
    oracle) exact rather than run-to-convergence. Reads the
    session-cached edge table — no per-query edge rebuild.
    """
    from .graph import edge_table

    t = Tables(spark, sf_dir)
    edges = edge_table(spark, t, sf_dir)
    cur = edges.select("u", "v")
    stats = []
    for r in range(1, KCORE_ROUNDS + 1):
        ends = cur.select(F.col("u").alias("node")).unionAll(
            cur.select(F.col("v").alias("node"))
        )
        surv = (
            ends.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= KCORE_K)
            .select("node")
        )
        # persist (lazy), not eager localCheckpoint: the three rounds'
        # stats evaluate in ONE action over the unioned plan, with each
        # round's edge set cached the first time the chain reaches it —
        # eager per-round materialization + per-round counts was 9 jobs
        # and 3.9s warm at sf0.1
        cur = (
            cur.join(surv.select(F.col("node").alias("u")), "u")
            .join(surv.select(F.col("node").alias("v")), "v")
            .select("u", "v")
            .persist()
        )
        ends_r = cur.select(F.col("u").alias("node")).unionAll(
            cur.select(F.col("v").alias("node"))
        )
        stats.append(
            ends_r.agg(
                F.lit(r).cast("long").alias("round"),
                F.countDistinct("node").alias("n_nodes"),
                (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            )
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


# ---------------------------------------------------------------------------
# 6. Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------


def _theil_sen_oracle() -> str:
    return """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
      FROM daily
    ), pairs AS (
      SELECT a.event_type,
             CAST(CASE WHEN b.cents >= a.cents
               THEN  ((20000::HUGEINT * (b.cents - a.cents) + (b.i - a.i))
                      // (2::HUGEINT * (b.i - a.i)))
               ELSE -((20000::HUGEINT * (a.cents - b.cents) + (b.i - a.i))
                      // (2::HUGEINT * (b.i - a.i)))
             END AS BIGINT) AS slope_q4
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND b.i > a.i
    )
    SELECT event_type,
           CAST((SELECT count(*) FROM idx x WHERE x.event_type = p.event_type)
                AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(quantile_disc(slope_q4, 0.5) AS BIGINT) / 10000.0
             AS trend_cents_per_day
    FROM pairs p GROUP BY event_type
    """


@register("stats_theil_sen_trend", oracle=_theil_sen_oracle())
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue per event type: the
    MEDIAN of all pairwise day-to-day slopes — the outlier-immune
    alternative to OLS regression (one corrupted day moves OLS
    arbitrarily; it moves the pairwise-slope median by one rank).

    Exactness: slopes are exact half-up integer ratios of cents over
    day-index differences at 4 dp (decimal-domain, cents-scale-proof),
    and the median is the exact discrete quantile over those int64s.
    Scale: the corpus collapses to a |event_types| x |days| series
    first; the O(days^2) pair join runs on that BOUNDED series (days
    grow with calendar time, not data volume) — never on raw rows.
    """
    t = Tables(spark, sf_dir)
    daily = (
        t.events.select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("c_row"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c_row").alias("cents"))
    )
    idx = daily.select(
        "event_type",
        "cents",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("i"),
    )
    b = idx.select(
        F.col("event_type").alias("et_b"),
        F.col("cents").alias("cents_b"),
        F.col("i").alias("i_b"),
    )
    num = _dec(F.col("cents_b")) - _dec(F.col("cents"))
    den = _dec(F.col("i_b")) - _dec(F.col("i"))
    a_ = F.lit(20000).cast("decimal(38,0)") * F.abs(num) + den
    b_ = F.lit(2).cast("decimal(38,0)") * den
    mag = ((a_ - a_ % b_) / b_).cast("long")
    slope_q4 = F.when(num < 0, -mag).otherwise(mag)
    pairs = (
        idx.join(
            b,
            (F.col("et_b") == F.col("event_type")) & (F.col("i_b") > F.col("i")),
        )
        .select("event_type", slope_q4.alias("slope_q4"))
    )
    n_days = idx.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    exact = str(2**31 - 1)
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr(f"percentile_approx(slope_q4, 0.5, {exact})")
            .cast("long")
            .alias("med_q4"),
        )
        .join(F.broadcast(n_days), "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            (F.col("med_q4") / F.lit(1e4)).alias("trend_cents_per_day"),
        )
    )


# ---------------------------------------------------------------------------
# 7. Spearman rank correlation (midranks, tie-exact)
# ---------------------------------------------------------------------------


def _spearman_oracle() -> str:
    return """
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS v_m,
             CAST(hour(ts) AS BIGINT) AS h
      FROM events
    ), vx AS (
      SELECT event_type, v_m, CAST(count(*) AS BIGINT) AS cnt,
             coalesce(sum(count(*)) OVER (PARTITION BY event_type ORDER BY v_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM q GROUP BY event_type, v_m
    ), vy AS (
      SELECT event_type, h, CAST(count(*) AS BIGINT) AS cnt,
             coalesce(sum(count(*)) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM q GROUP BY event_type, h
    ), r AS (
      SELECT q.event_type,
             CAST(2 * vx.cum + vx.cnt + 1 AS HUGEINT) AS rx2,
             CAST(2 * vy.cum + vy.cnt + 1 AS HUGEINT) AS ry2
      FROM q
      JOIN vx ON vx.event_type = q.event_type AND vx.v_m = q.v_m
      JOIN vy ON vy.event_type = q.event_type AND vy.h = q.h
    ), s AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             sum(rx2) AS sx, sum(ry2) AS sy,
             sum(rx2 * rx2) AS sxx, sum(ry2 * ry2) AS syy,
             sum(rx2 * ry2) AS sxy
      FROM r GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                             * CAST(n * syy - sy * sy AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS spearman_rho
    FROM s
    """


@register("stats_spearman_corr", oracle=_spearman_oracle())
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and hour-of-day,
    per event type — the monotonic-association test (does value drift
    across the day?), tie-exact via midranks.

    Ranks never materialize per row from a sort: both variables
    pre-aggregate to their distinct-value histograms, midranks come
    from the (cum, cnt) window over those bounded domains (doubled to
    stay integral), and each event row joins its two midranks back.
    All five sufficient sums are exact decimal integers; the one
    final expression (Pearson on midranks) runs in doubles whose
    inputs are casts of identical integers on both engines, with
    matching association order, sqrt being correctly rounded — then a
    single micro-unit quantization. Scale: two domain-bounded windows
    plus one corpus-wide partial-aggregated sum; no row-level sort.
    """
    t = Tables(spark, sf_dir)
    from ..functions.exact import quantize

    q = t.events.select(
        "event_type",
        quantize(F.col("value"), 3).alias("v_m"),
        F.hour("ts").cast("long").alias("h"),
    )
    wv = Window.partitionBy("event_type").orderBy("v_m").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wh = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, -1
    )
    vx = q.groupBy("event_type", "v_m").agg(F.count(F.lit(1)).alias("cnt")).select(
        "event_type",
        "v_m",
        "cnt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("cum"),
    )
    vy = q.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("cnt")).select(
        "event_type",
        "h",
        "cnt",
        F.coalesce(F.sum("cnt").over(wh), F.lit(0)).alias("cum"),
    )
    r = (
        q.join(
            vx.select(
                "event_type", "v_m", (2 * F.col("cum") + F.col("cnt") + 1).alias("rx2")
            ),
            ["event_type", "v_m"],
        )
        .join(
            F.broadcast(
                vy.select(
                    "event_type",
                    "h",
                    (2 * F.col("cum") + F.col("cnt") + 1).alias("ry2"),
                )
            ),
            ["event_type", "h"],
        )
        .select("event_type", _dec(F.col("rx2")).alias("rx2"), _dec(F.col("ry2")).alias("ry2"))
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    n = _dec(F.col("n"))
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    rho = (
        F.floor(num / F.sqrt(denx * deny) * F.lit(1e6) + F.lit(0.5)).cast("long")
        / F.lit(1e6)
    )
    return s.select(
        "event_type", F.col("n").alias("n_events"), rho.alias("spearman_rho")
    )
