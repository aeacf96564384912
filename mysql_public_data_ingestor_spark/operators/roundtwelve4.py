"""Round-12 banked operator queue, batch I — built AND gated in round
11 (same-commit rule: ``tests/test_roundtwelve4.py`` carries raw-frame
oracle parity, plan bars and Python replicas with float anchors;
SCALE.md §5j.10 records the ×10 ladder from this round's session).

NOT imported by ``registry._ensure_loaded`` yet — the round-11 window
is exactly full at 50 unverified names. ``activate()`` is the round-12
switch (flip together with the other ``roundtwelve*`` queues; the bank
now totals 20 ops).

Batch theme — shrinkage, serial-correlation-corrected trend, mixture
drift and threshold governance: empirical-Bayes beta-binomial
shrinkage of per-nation completion rates, the Cochrane–Orcutt AR(1)-
corrected trend (the FIX step after ``stats_durbin_watson_daily``
diagnoses autocorrelation and ``stats_breusch_pagan_daily`` variance
drift), source-mixture drift across ingestion deciles (the crawl-
composition monitor), and a train/holdout threshold-transfer audit
(does the Youden-optimal threshold survive resampling?). Every name
was checked against the full registry inventory before design (the
§5j.7 authoring rule).

Reference parity note: the reference (Go ingestion pipeline) has no
analytics; these extend SURVEY §2.C warehouse statistics / corpus
management / ML governance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import Tables
from .roundeleven import _dec, _halfup_div, _sql_halfup_div

QUEUE: list[tuple] = []


def _queued(name: str, oracle: str):
    def deco(fn):
        QUEUE.append((name, fn, oracle, fn.__doc__ or ""))
        return fn

    return deco


_ACTIVATED = False


def activate() -> None:
    """Register every queued query (round-12 switch; idempotent)."""
    global _ACTIVATED
    if _ACTIVATED:
        return
    from ..registry import register

    for name, fn, oracle, doc in QUEUE:
        register(name, oracle=oracle, doc=doc)(fn)
    _ACTIVATED = True


# ---------------------------------------------------------------------------
# 1. Empirical-Bayes beta-binomial shrinkage of per-nation rates
# ---------------------------------------------------------------------------


def _eb_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH rates AS (
      SELECT n.n_name AS nation,
             CAST(count(*) AS HUGEINT) AS n_orders,
             CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS HUGEINT) AS k_pos
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ), pm AS (
      SELECT nation, n_orders, k_pos,
             {hd('1000000::HUGEINT * k_pos', 'n_orders')} AS p_micro
      FROM rates
    ), gstats AS (
      SELECT CAST(count(*) AS HUGEINT) AS g,
             CAST(sum(p_micro) AS HUGEINT) AS sp,
             CAST(sum({hd('1000000000::HUGEINT', 'n_orders')}) AS HUGEINT)
               AS s_inv_nano
      FROM pm
    ), pbar AS (
      SELECT g, s_inv_nano, {hd('sp', 'g')} AS pbar_micro FROM gstats
    ), s2 AS (
      SELECT pb.g, pb.pbar_micro, pb.s_inv_nano,
             {hd('CAST((SELECT sum((p_micro - pb.pbar_micro)'
                 ' * (p_micro - pb.pbar_micro)) FROM pm) AS HUGEINT)',
                 'pb.g - 1')} AS s2_pico,
             {hd('pb.s_inv_nano', 'pb.g')} AS mean_inv_nano
      FROM pbar pb
    ), mo AS (
      SELECT g, pbar_micro,
             s2_pico,
             {hd('pbar_micro * (1000000 - pbar_micro) * mean_inv_nano',
                 '1000000000::HUGEINT')} AS vw_pico
      FROM s2
    ), m AS (
      SELECT g, pbar_micro, s2_pico, vw_pico,
             CASE WHEN s2_pico - vw_pico > 0 THEN
               greatest({hd('1000::HUGEINT * pbar_micro * (1000000 - pbar_micro)',
                            's2_pico - vw_pico')} - 1000, 0)
             END AS m_milli
      FROM mo
    )
    SELECT r.nation, CAST(r.n_orders AS BIGINT) AS n_orders,
           CAST(r.k_pos AS BIGINT) AS n_pos,
           CAST(p.p_micro AS BIGINT) AS raw_micro,
           CAST(m.m_milli AS BIGINT) AS prior_strength_milli,
           CAST(CASE WHEN m.m_milli IS NULL THEN m.pbar_micro ELSE
             {hd('1000000000::HUGEINT * r.k_pos + m.m_milli * m.pbar_micro',
                 '1000::HUGEINT * r.n_orders + m.m_milli')}
           END AS BIGINT) AS shrunk_micro,
           CAST(CASE WHEN m.m_milli IS NULL THEN 1000 ELSE
             {hd('1000::HUGEINT * m.m_milli',
                 '1000::HUGEINT * r.n_orders + m.m_milli')}
           END AS BIGINT) AS prior_weight_milli
    FROM rates r JOIN pm p ON p.nation = r.nation, m
    ORDER BY r.nation
    """


@_queued("stats_eb_beta_binomial_shrinkage", _eb_oracle())
def stats_eb_beta_binomial_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-nation order-completion rates:
    method-of-moments beta-binomial prior (strength M = p(1-p)/tau^2
    - 1 pseudo-observations of the global rate, tau^2 the between-
    nation variance in excess of binomial sampling noise), then
    shrunk_i = (k_i + M pbar)/(n_i + M). THE standard fix for
    small-sample league tables — raw per-segment rates over-disperse
    and the smallest segments dominate both tails
    (``stats_wilson_ci_by_nation`` widens intervals; this moves the
    ESTIMATE, which is what a ranking or alert threshold consumes).
    When tau^2 <= 0 (no evidence of real between-nation variation)
    the estimator degenerates to the global rate, reported as NULL
    prior strength + full prior weight.

    Exactness: the whole MoM chain runs in staged fixed-point integers
    (rates micro, variances pico, inverse sizes nano, M milli) — every
    step one half-up division of exact integers, identical on both
    engines; the replica re-runs the integer chain AND anchors against
    the float MoM formulas.

    Scale shape: one orders scan with two broadcast dimension joins to
    25 nation cells; the MoM is 25-row algebra.
    """
    t = Tables(spark, sf_dir)
    rates = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dec(F.count(F.lit(1))).alias("n_orders"),
            _dec(
                F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            ).alias("k_pos"),
        )
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    g9 = F.lit(10**9).cast("decimal(38,0)")
    pm = rates.select(
        "nation",
        "n_orders",
        "k_pos",
        _halfup_div(m6 * F.col("k_pos"), F.col("n_orders")).alias("p_micro"),
        _halfup_div(g9, F.col("n_orders")).alias("inv_nano"),
    )
    gstats = pm.agg(
        _dec(F.count(F.lit(1))).alias("g"),
        F.sum("p_micro").alias("sp"),
        F.sum("inv_nano").alias("s_inv_nano"),
    ).select(
        "g",
        "s_inv_nano",
        _halfup_div(F.col("sp"), F.col("g")).alias("pbar_micro"),
    )
    s2 = (
        pm.crossJoin(F.broadcast(gstats))
        .agg(
            F.sum(
                (F.col("p_micro") - F.col("pbar_micro"))
                * (F.col("p_micro") - F.col("pbar_micro"))
            ).alias("sdev2"),
            F.max("g").alias("g"),
            F.max("pbar_micro").alias("pbar_micro"),
            F.max("s_inv_nano").alias("s_inv_nano"),
        )
        .select(
            "g",
            "pbar_micro",
            _halfup_div(F.col("sdev2"), F.col("g") - 1).alias("s2_pico"),
            _halfup_div(F.col("s_inv_nano"), F.col("g")).alias("mean_inv_nano"),
        )
    )
    mo = s2.select(
        "g",
        "pbar_micro",
        "s2_pico",
        _halfup_div(
            F.col("pbar_micro") * (m6 - F.col("pbar_micro")) * F.col("mean_inv_nano"),
            g9,
        ).alias("vw_pico"),
    )
    k3 = F.lit(1000).cast("decimal(38,0)")
    mm = mo.select(
        "pbar_micro",
        F.when(
            F.col("s2_pico") - F.col("vw_pico") > 0,
            F.greatest(
                _halfup_div(
                    k3 * F.col("pbar_micro") * (m6 - F.col("pbar_micro")),
                    F.col("s2_pico") - F.col("vw_pico"),
                )
                - 1000,
                F.lit(0).cast("decimal(38,0)"),
            ),
        ).alias("m_milli"),
    )
    out = pm.crossJoin(F.broadcast(mm))
    shrunk = F.when(F.col("m_milli").isNull(), F.col("pbar_micro")).otherwise(
        _halfup_div(
            g9 * F.col("k_pos") + F.col("m_milli") * F.col("pbar_micro"),
            k3 * F.col("n_orders") + F.col("m_milli"),
        )
    )
    weight = F.when(F.col("m_milli").isNull(), F.lit(1000)).otherwise(
        _halfup_div(k3 * F.col("m_milli"), k3 * F.col("n_orders") + F.col("m_milli"))
    )
    return out.select(
        "nation",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("k_pos").cast("long").alias("n_pos"),
        F.col("p_micro").cast("long").alias("raw_micro"),
        F.col("m_milli").cast("long").alias("prior_strength_milli"),
        shrunk.cast("long").alias("shrunk_micro"),
        weight.cast("long").alias("prior_weight_milli"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# 2. Cochrane–Orcutt AR(1)-corrected trend on daily counts
# ---------------------------------------------------------------------------

CO_RES_SCALE = 100  # centi residuals, the Breusch-Pagan convention


def _co_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS HUGEINT) AS y
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT a.day, a.y, CAST(count(*) AS HUGEINT) AS k
      FROM daily a JOIN daily b ON b.day <= a.day
      GROUP BY a.day, a.y
    ), s1 AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(k) AS HUGEINT) AS sk,
             CAST(sum(k * k) AS HUGEINT) AS skk,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(k * y) AS HUGEINT) AS sky
      FROM idx
    ), coef AS (
      SELECT n, sk, sy,
             (n * skk - sk * sk) AS d, (n * sky - sk * sy) AS b
      FROM s1
    ), resid AS (
      SELECT i.k, i.y,
             {hd(f'{CO_RES_SCALE}::HUGEINT * '
                 '(c.n * c.d * i.y - c.d * c.sy + c.b * c.sk - c.n * c.b * i.k)',
                 'c.n * c.d')} AS u
      FROM idx i, coef c
    ), rho AS (
      SELECT {hd('1000000::HUGEINT * CAST((SELECT sum(a.u * b.u) FROM resid a '
                 'JOIN resid b ON b.k = a.k - 1) AS HUGEINT)',
                 'CAST((SELECT sum(u * u) FROM resid) AS HUGEINT)')} AS rho_micro
      FROM (SELECT 1)
    ), trans AS (
      SELECT (1000000::HUGEINT * a.y - r.rho_micro * b.y) AS ys,
             (1000000::HUGEINT * a.k - r.rho_micro * (a.k - 1)) AS xs
      FROM resid a JOIN resid b ON b.k = a.k - 1, rho r
    ), s2 AS (
      SELECT CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(xs) AS HUGEINT) AS sx,
             CAST(sum(xs * xs) AS HUGEINT) AS sxx,
             CAST(sum(ys) AS HUGEINT) AS syt,
             CAST(sum(xs * ys) AS HUGEINT) AS sxy
      FROM trans
    )
    SELECT CAST(c.n AS BIGINT) AS n_days,
           CAST(r.rho_micro AS BIGINT) AS rho_micro,
           CAST({hd('1000000::HUGEINT * c.b', 'c.d')} AS BIGINT)
             AS ols_slope_micro,
           CAST({hd('1000000::HUGEINT * (s2.m * s2.sxy - s2.sx * s2.syt)',
                    's2.m * s2.sxx - s2.sx * s2.sx')} AS BIGINT)
             AS co_slope_micro
    FROM coef c, rho r, s2
    """


@_queued("stats_cochrane_orcutt_trend", _co_oracle())
def stats_cochrane_orcutt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochrane–Orcutt AR(1)-corrected trend estimate on the daily
    order-count series: estimate rho from the lag-1 autocorrelation of
    the OLS residuals, quasi-difference (y_t - rho y_{t-1} on
    x_t - rho x_{t-1}), and re-fit — the FIX step the residual-
    diagnostic suite points at (``stats_durbin_watson_daily`` detects
    the autocorrelation that makes plain OLS standard errors wrong;
    this delivers the corrected slope). Reporting both slopes side by
    side shows how much the naive trend moves once serial correlation
    is absorbed.

    Exactness: residuals quantize ONCE at centi resolution off exact
    integer numerators (the Breusch-Pagan convention); rho is ONE
    half-up 1e-6 ratio of exact integer lag products; the transformed
    series is exact integers (1e6-scaled quasi-differences with the
    integer rho); both slopes are single half-up big-integer ratios.

    Scale shape: one fact scan to the ~2.4k-day table; the lag pairing
    is a rank equi-join on the calendar-bounded index; two 5-number
    sufficient-sum aggregates.
    """
    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        _dec(F.count(F.lit(1))).alias("y")
    )
    b0 = daily.select(F.col("day").alias("day_b"))
    idx = (
        daily.join(F.broadcast(b0), F.col("day_b") <= F.col("day"))
        .groupBy("day", "y")
        .agg(_dec(F.count(F.lit(1))).alias("k"))
    )
    s1 = idx.agg(
        _dec(F.count(F.lit(1))).alias("n"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.sum("y").alias("sy"),
        F.sum(F.col("k") * F.col("y")).alias("sky"),
    )
    coef = s1.select(
        "n",
        "sk",
        "sy",
        (F.col("n") * F.col("skk") - F.col("sk") * F.col("sk")).alias("d"),
        (F.col("n") * F.col("sky") - F.col("sk") * F.col("sy")).alias("b"),
    )
    rnum = (
        F.col("n") * F.col("d") * F.col("y")
        - F.col("d") * F.col("sy")
        + F.col("b") * F.col("sk")
        - F.col("n") * F.col("b") * F.col("k")
    )
    resid = idx.crossJoin(F.broadcast(coef)).select(
        "k",
        "y",
        _halfup_div(
            F.lit(CO_RES_SCALE).cast("decimal(38,0)") * rnum, F.col("n") * F.col("d")
        ).alias("u"),
    )
    lagged = resid.select(
        (F.col("k") + 1).alias("k"), F.col("u").alias("up"), F.col("y").alias("yp")
    )
    paired = resid.join(lagged, "k")
    rho = (
        paired.agg(F.sum(F.col("u") * F.col("up")).alias("num"))
        .crossJoin(F.broadcast(resid.agg(F.sum(F.col("u") * F.col("u")).alias("den"))))
        .select(
            _halfup_div(
                F.lit(1_000_000).cast("decimal(38,0)") * F.col("num"), F.col("den")
            ).alias("rho_micro")
        )
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    trans = paired.crossJoin(F.broadcast(rho)).select(
        (m6 * F.col("y") - F.col("rho_micro") * F.col("yp")).alias("ys"),
        (m6 * F.col("k") - F.col("rho_micro") * (F.col("k") - 1)).alias("xs"),
    )
    s2 = trans.agg(
        _dec(F.count(F.lit(1))).alias("m"),
        F.sum("xs").alias("sx"),
        F.sum(F.col("xs") * F.col("xs")).alias("sxx"),
        F.sum("ys").alias("syt"),
        F.sum(F.col("xs") * F.col("ys")).alias("sxy"),
    )
    return (
        coef.crossJoin(F.broadcast(rho))
        .crossJoin(F.broadcast(s2))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.col("rho_micro").cast("long").alias("rho_micro"),
            _halfup_div(m6 * F.col("b"), F.col("d")).cast("long").alias("ols_slope_micro"),
            _halfup_div(
                m6 * (F.col("m") * F.col("sxy") - F.col("sx") * F.col("syt")),
                F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"),
            )
            .cast("long")
            .alias("co_slope_micro"),
        )
    )


# ---------------------------------------------------------------------------
# 3. Source-mixture drift across ingestion deciles
# ---------------------------------------------------------------------------

DRIFT_DECILES = 10


def _drift_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH dd AS (
      SELECT (('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15)))::BIGINT
               % {DRIFT_DECILES} AS d,
             source
      FROM documents
    ), cells AS (
      SELECT d, source, CAST(count(*) AS HUGEINT) AS c FROM dd GROUP BY d, source
    ), per_d AS (
      SELECT d, CAST(sum(c) AS HUGEINT) AS n_d FROM cells GROUP BY d
    ), tops AS (
      SELECT d, min(source) AS top_source FROM cells c1
      WHERE c = (SELECT max(c) FROM cells c2 WHERE c2.d = c1.d)
      GROUP BY d
    ), cur AS (
      SELECT d, source, c FROM cells WHERE d >= 1
    ), prv AS (
      SELECT d + 1 AS d, source, c FROM cells WHERE d <= {DRIFT_DECILES - 2}
    ), pairs AS (
      SELECT coalesce(a.d, b.d) AS d, coalesce(a.source, b.source) AS source,
             coalesce(a.c, 0::HUGEINT) AS c_cur,
             coalesce(b.c, 0::HUGEINT) AS c_prev
      FROM cur a FULL JOIN prv b ON a.d = b.d AND a.source = b.source
    ), tvd AS (
      SELECT pr.d,
             CAST(sum(abs(pr.c_cur * np.n_d - pr.c_prev * nc.n_d)) AS HUGEINT)
               AS num,
             2::HUGEINT * nc.n_d * np.n_d AS den
      FROM pairs pr
      JOIN per_d nc ON nc.d = pr.d
      JOIN per_d np ON np.d = pr.d - 1
      GROUP BY pr.d, nc.n_d, np.n_d
    )
    SELECT p.d, CAST(p.n_d AS BIGINT) AS n_docs, t.top_source,
           CAST({hd('1000000::HUGEINT * (SELECT max(c) FROM cells c2 WHERE c2.d = p.d)',
                    'p.n_d')} AS BIGINT) AS top_share_micro,
           CAST((SELECT {hd('1000000::HUGEINT * v.num', 'v.den')}
                 FROM tvd v WHERE v.d = p.d) AS BIGINT) AS tvd_prev_micro
    FROM per_d p JOIN tops t ON t.d = p.d
    ORDER BY p.d
    """


@_queued("corpus_source_mixture_drift", _drift_oracle())
def corpus_source_mixture_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture drift across the 10 deterministic ingestion
    deciles (the sha256(doc_id) pseudo-order every corpus sampler
    uses): per decile, the dominant source and its share, plus the
    total-variation distance between consecutive deciles' source
    mixes — the crawl-composition monitor. A TVD spike at decile d
    says the feed mix CHANGED mid-ingestion (a mirror came online, a
    source died), which silently shifts every downstream mixture
    weight (``corpus_mixture_weights`` assumes the mix is what it
    measures; this says WHEN that assumption broke).
    ``corpus_shard_skew_audit`` audits skew across SHARDS; this audits
    drift across pseudo-TIME.

    Exactness: TVD between deciles d-1, d is the exact integer
    sum |c_{{d,s}} n_{{d-1}} - c_{{d-1,s}} n_d| over the source union,
    one half-up 1e-6 division by 2 n_d n_{{d-1}}; top shares are
    single half-up ratios; the argmax source breaks ties to the
    lexicographically smallest (explicit min over the max-count set,
    never an engine-unspecified arg_max).

    Scale shape: one scan to the <= 10 x |sources| cell grid;
    consecutive-decile pairing is a bounded full-outer join on the
    grid; everything after is 10-row algebra.
    """
    from ..functions.textnorm import sha256_prefix_i64

    t = Tables(spark, sf_dir)
    d = (sha256_prefix_i64(F.col("doc_id").cast("string")) % DRIFT_DECILES).alias("d")
    cells = t.documents.groupBy(d, "source").agg(_dec(F.count(F.lit(1))).alias("c"))
    per_d = cells.groupBy("d").agg(F.sum("c").alias("n_d"))
    mx = cells.groupBy("d").agg(F.max("c").alias("mc"))
    tops = (
        cells.join(F.broadcast(mx), "d")
        .filter(F.col("c") == F.col("mc"))
        .groupBy("d")
        .agg(F.min("source").alias("top_source"), F.max("mc").alias("mc"))
    )
    cur = cells.select("d", "source", F.col("c").alias("c_cur"))
    prv = cells.select((F.col("d") + 1).alias("d"), "source", F.col("c").alias("c_prev"))
    zero = F.lit(0).cast("decimal(38,0)")
    pairs = (
        cur.join(prv, ["d", "source"], "full")
        .filter((F.col("d") >= 1) & (F.col("d") <= DRIFT_DECILES - 1))
        .select(
            "d",
            "source",
            F.coalesce(F.col("c_cur"), zero).alias("c_cur"),
            F.coalesce(F.col("c_prev"), zero).alias("c_prev"),
        )
    )
    nd_cur = per_d.select("d", F.col("n_d").alias("nc"))
    nd_prev = per_d.select((F.col("d") + 1).alias("d"), F.col("n_d").alias("np"))
    tvd = (
        pairs.join(F.broadcast(nd_cur), "d")
        .join(F.broadcast(nd_prev), "d")
        .groupBy("d", "nc", "np")
        .agg(
            F.sum(
                F.abs(F.col("c_cur") * F.col("np") - F.col("c_prev") * F.col("nc"))
            ).alias("num")
        )
        .select(
            "d",
            _halfup_div(
                F.lit(1_000_000).cast("decimal(38,0)") * F.col("num"),
                2 * F.col("nc") * F.col("np"),
            ).alias("tvd_prev_micro"),
        )
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    return (
        per_d.join(F.broadcast(tops), "d")
        .join(F.broadcast(tvd), "d", "left")
        .select(
            "d",
            F.col("n_d").cast("long").alias("n_docs"),
            "top_source",
            _halfup_div(m6 * F.col("mc"), F.col("n_d")).cast("long").alias(
                "top_share_micro"
            ),
            F.col("tvd_prev_micro").cast("long").alias("tvd_prev_micro"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# 4. Train/holdout threshold-transfer audit (Youden threshold stability)
# ---------------------------------------------------------------------------


def _transfer_oracle() -> str:
    from .ml import _scored_labeled_sql

    hd = _sql_halfup_div
    return (
        _scored_labeled_sql()
        + f"""
    , folded AS (
      SELECT score_q, label,
             (('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15)))::BIGINT
               % 2 AS fold
      FROM scored
    ), grid AS (
      SELECT fold, score_q,
             CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS c0,
             CAST(sum(label) AS HUGEINT) AS c1
      FROM folded GROUP BY fold, score_q
    ), cum AS (
      -- descending cumulative: docs with score >= s flagged positive
      SELECT a.fold, a.score_q,
             CAST(sum(b.c0) AS HUGEINT) AS fp,
             CAST(sum(b.c1) AS HUGEINT) AS tp
      FROM grid a JOIN grid b ON b.fold = a.fold AND b.score_q >= a.score_q
      GROUP BY a.fold, a.score_q
    ), tot AS (
      SELECT fold, CAST(sum(c0) AS HUGEINT) AS n0, CAST(sum(c1) AS HUGEINT) AS n1
      FROM grid GROUP BY fold
    ), j AS (
      SELECT c.fold, c.score_q,
             (t.n0 * c.tp - t.n1 * c.fp) AS j_scaled, t.n0, t.n1
      FROM cum c JOIN tot t ON t.fold = c.fold
    ), best AS (
      SELECT fold, min(score_q) AS thr
      FROM j x WHERE j_scaled = (SELECT max(j_scaled) FROM j y
                                 WHERE y.fold = x.fold)
      GROUP BY fold
    ), vals AS (
      SELECT f.fold, f.thr, j.j_scaled, j.n0, j.n1
      FROM best f JOIN j ON j.fold = f.fold AND j.score_q = f.thr
    ), cross_ AS (
      -- fold A's threshold applied to fold B: "score >= thr" counts
      -- come from the SMALLEST holdout-grid score >= thr (the train
      -- threshold need not exist as a holdout score value); an empty
      -- upper set means nothing is flagged -> J = 0
      SELECT coalesce(j.j_scaled, 0::HUGEINT) AS jb_at_a, t.n0, t.n1
      FROM vals a
      JOIN tot t ON t.fold = 1
      LEFT JOIN j ON j.fold = 1
        AND j.score_q = (SELECT min(score_q) FROM j y
                         WHERE y.fold = 1 AND y.score_q >= a.thr)
      WHERE a.fold = 0
    )
    SELECT CAST(a.n1 + a.n0 AS BIGINT) AS n_train,
           CAST(b.n1 + b.n0 AS BIGINT) AS n_holdout,
           CAST(a.thr AS BIGINT) AS thr_train,
           CAST({hd('1000000::HUGEINT * a.j_scaled', 'a.n0 * a.n1')} AS BIGINT)
             AS j_train_micro,
           CAST(b.thr AS BIGINT) AS thr_holdout_opt,
           CAST({hd('1000000::HUGEINT * b.j_scaled', 'b.n0 * b.n1')} AS BIGINT)
             AS j_holdout_opt_micro,
           CAST({hd('1000000::HUGEINT * c.jb_at_a', 'c.n0 * c.n1')} AS BIGINT)
             AS j_holdout_at_train_thr_micro,
           CAST({hd('1000000::HUGEINT * b.j_scaled', 'b.n0 * b.n1')}
                - {hd('1000000::HUGEINT * c.jb_at_a', 'c.n0 * c.n1')} AS BIGINT)
             AS transfer_regret_micro
    FROM vals a, vals b, cross_ c
    WHERE a.fold = 0 AND b.fold = 1
    """
    )


@_queued("ml_threshold_transfer_audit", _transfer_oracle())
def ml_threshold_transfer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-transfer audit: pick the Youden-optimal classifier
    threshold on a deterministic half of the corpus, apply it to the
    OTHER half, and report the Youden J it actually achieves there
    versus that half's own optimum — the transfer REGRET.
    ``ml_youden_optimal_threshold`` optimizes in-sample; a threshold
    that looks optimal can overfit score-grid noise, and the regret is
    the number a deployment gate needs before freezing the cut-off
    (same governance shape as ``ml_conformal_threshold_by_lang``,
    which calibrates coverage instead of J).

    Exactness: J is carried as the exact integer n0 TP - n1 FP on the
    bounded score grid (no per-threshold division); argmax ties break
    to the smallest score by explicit equality + min; the three J
    ratios and the regret are single half-up 1e-6 divisions.

    Scale shape: one zero-shuffle scoring scan to the <= 2 x 10001
    (fold, score) grid; the descending cumulative is the coarse-bin
    two-pass (101 bins via broadcast join + in-bin window partitioned
    by fold and bin — the `ml_gains_at_capacity` pattern), never the
    direct grid self-join; threshold picks are grid-bounded algebra.
    """
    from pyspark.sql.window import Window

    from ..functions.textnorm import sha256_prefix_i64
    from .ml import _scored_labeled

    t = Tables(spark, sf_dir)
    sc = _scored_labeled(t).select(
        "score_q",
        "label",
        (sha256_prefix_i64(F.col("doc_id").cast("string")) % 2).alias("fold"),
    )
    grid = (
        sc.groupBy("fold", "score_q")
        .agg(
            _dec(F.sum(F.when(F.col("label") == 0, 1).otherwise(0))).alias("c0"),
            _dec(F.sum("label")).alias("c1"),
        )
        .localCheckpoint(eager=False)
    )
    gb = grid.withColumn("gbin", F.expr("score_q div 100"))
    bins = gb.groupBy("fold", "gbin").agg(
        F.sum("c0").alias("b0"), F.sum("c1").alias("b1")
    )
    b2 = bins.select(
        F.col("fold").alias("fold2"),
        F.col("gbin").alias("gbin2"),
        F.col("b0").alias("b0_2"),
        F.col("b1").alias("b1_2"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    bcum = (
        bins.join(
            F.broadcast(b2),
            (F.col("fold2") == F.col("fold")) & (F.col("gbin2") > F.col("gbin")),
            "left",
        )
        .groupBy("fold", "gbin")
        .agg(
            F.coalesce(F.sum("b0_2"), zero).alias("hi0"),
            F.coalesce(F.sum("b1_2"), zero).alias("hi1"),
        )
    )
    w_in = (
        Window.partitionBy("fold", "gbin")
        .orderBy(F.col("score_q").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = gb.join(F.broadcast(bcum), ["fold", "gbin"]).select(
        "fold",
        "score_q",
        (F.col("hi0") + F.sum("c0").over(w_in)).alias("fp"),
        (F.col("hi1") + F.sum("c1").over(w_in)).alias("tp"),
    )
    tot = grid.groupBy("fold").agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"))
    j = cum.join(F.broadcast(tot), "fold").select(
        "fold",
        "score_q",
        (F.col("n0") * F.col("tp") - F.col("n1") * F.col("fp")).alias("j_scaled"),
        "n0",
        "n1",
    )
    jb = j.groupBy("fold").agg(F.max("j_scaled").alias("mj"))
    best = (
        j.join(F.broadcast(jb), "fold")
        .filter(F.col("j_scaled") == F.col("mj"))
        .groupBy("fold")
        .agg(F.min("score_q").alias("thr"))
    )
    vals = best.join(
        j.select("fold", F.col("score_q").alias("thr"), "j_scaled", "n0", "n1"),
        ["fold", "thr"],
    )
    a = vals.filter(F.col("fold") == 0).select(
        F.col("thr").alias("thr_train"),
        F.col("j_scaled").alias("ja"),
        F.col("n0").alias("a0"),
        F.col("n1").alias("a1"),
    )
    bfold = vals.filter(F.col("fold") == 1).select(
        F.col("thr").alias("thr_holdout_opt"),
        F.col("j_scaled").alias("jb_opt"),
        F.col("n0").alias("b0"),
        F.col("n1").alias("b1"),
    )
    # the train threshold need not exist as a holdout score value:
    # "score >= thr" counts come from the SMALLEST holdout-grid score
    # >= thr; an empty upper set flags nothing -> J = 0
    j1 = j.filter(F.col("fold") == 1).select(
        F.col("score_q").alias("s1"), F.col("j_scaled").alias("j1s")
    )
    probe = (
        a.join(F.broadcast(j1), F.col("s1") >= F.col("thr_train"), "left")
        .groupBy("thr_train", "ja", "a0", "a1")
        .agg(F.min_by(F.col("j1s"), F.col("s1")).alias("jb_at_a_raw"))
    )
    cross_ = probe.select(
        "thr_train",
        "ja",
        "a0",
        "a1",
        F.coalesce(F.col("jb_at_a_raw"), F.lit(0).cast("decimal(38,0)")).alias(
            "jb_at_a"
        ),
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    jt = _halfup_div(m6 * F.col("ja"), F.col("a0") * F.col("a1"))
    jo = _halfup_div(m6 * F.col("jb_opt"), F.col("b0") * F.col("b1"))
    jx = _halfup_div(m6 * F.col("jb_at_a"), F.col("b0") * F.col("b1"))
    return (
        cross_.crossJoin(F.broadcast(bfold))
        .select(
            (F.col("a0") + F.col("a1")).cast("long").alias("n_train"),
            (F.col("b0") + F.col("b1")).cast("long").alias("n_holdout"),
            F.col("thr_train").cast("long").alias("thr_train"),
            jt.cast("long").alias("j_train_micro"),
            F.col("thr_holdout_opt").cast("long").alias("thr_holdout_opt"),
            jo.cast("long").alias("j_holdout_opt_micro"),
            jx.cast("long").alias("j_holdout_at_train_thr_micro"),
            (jo - jx).cast("long").alias("transfer_regret_micro"),
        )
    )
