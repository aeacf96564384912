"""Round-15 banked operator queue, batch 2 — built AND gated in round
14 (same-commit rule: ``tests/test_roundfifteen2.py``; SCALE.md §5w
records the ×10 ladder). NOT imported by ``registry._ensure_loaded``
yet; ``activate()`` is the round-15 switch (flip together with
``roundfifteen.activate()``).

Batch theme — robust slopes, anomaly scoring, tail exponents, layout
geometry and drift: the Siegel repeated-medians trend (the
50%-breakdown robust slope beside Theil-Sen), MAD-based modified
z-score outlier days, the user-activity Zipf/power-law exponent pair,
the Hilbert-vs-Z-order locality audit (exact unrolled Hilbert
transform), triangle closure-delay histogram (the temporal face of
the triangle warehouse), and PSI drift of the classifier score across
the train/val hash split. Every name was checked against the full
617-name registry+bank inventory before design (the SCALE §5j.7
authoring rule).

Activation-time plan-allowlist notes: ``stats_siegel_repeated_medians``
and ``events_modified_zscore_outliers`` use bounded distinct-value
cumulatives (the Bartels class) — add both to
``SINGLE_PARTITION_ALLOWLIST`` at activation in the same commit. The
other four were swept clean.

Reference parity note: the reference (Go ingestion pipeline,
``/root/reference/main.go``) has no analytics; these extend SURVEY
§2.C warehouse statistics / time-series / layout / graph / ML.
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
    """Register every queued query (round-15 switch; idempotent)."""
    global _ACTIVATED
    if _ACTIVATED:
        return
    from ..registry import register

    for name, fn, oracle, doc in QUEUE:
        register(name, oracle=oracle, doc=doc)(fn)
    _ACTIVATED = True


# ---------------------------------------------------------------------------
# 1. Siegel repeated-medians slope of the daily order counts
# ---------------------------------------------------------------------------


def _siegel_oracle() -> str:
    from .roundeleven2 import _SQL_DAILY_COUNTS_IDX

    return f"""
    WITH {_SQL_DAILY_COUNTS_IDX.strip()}
    , slopes AS (
      SELECT a.k AS i,
             (CASE WHEN (a.y - b.y) < 0
               THEN -((2000000::HUGEINT * abs(a.y - b.y) + abs(a.k - b.k))
                      // (2::HUGEINT * abs(a.k - b.k)))
               ELSE ((2000000::HUGEINT * (a.y - b.y) + abs(a.k - b.k))
                     // (2::HUGEINT * abs(a.k - b.k)))
              END) * (CASE WHEN a.k > b.k THEN 1 ELSE -1 END)
               AS s_micro
      FROM idx a JOIN idx b ON a.k <> b.k
    ), permed AS (
      SELECT i, s_micro,
             row_number() OVER (PARTITION BY i ORDER BY s_micro) AS rn,
             count(*) OVER (PARTITION BY i) AS cnt
      FROM slopes
    ), imed AS (
      SELECT i, min(s_micro) AS med_i
      FROM permed WHERE 2 * rn >= cnt + 1 GROUP BY i
    ), mvals AS (
      SELECT med_i, CAST(count(*) AS BIGINT) AS cnt FROM imed GROUP BY med_i
    ), mcum AS (
      SELECT a.med_i, CAST(coalesce(sum(b.cnt), 0) + a.cnt AS BIGINT) AS cle
      FROM mvals a LEFT JOIN mvals b ON b.med_i < a.med_i
      GROUP BY a.med_i, a.cnt
    ), nn AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM imed
    )
    SELECT (SELECT n FROM nn) AS n_days,
           CAST((SELECT min(med_i) FROM mcum, nn WHERE 2 * cle >= n)
                AS BIGINT) AS siegel_slope_micro
    """


@_queued("stats_siegel_repeated_medians", _siegel_oracle())
def stats_siegel_repeated_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-medians slope (Siegel 1982) of the daily order
    counts: for each day, the median pairwise slope to every other
    day; then the median of those per-day medians.
    ``stats_theil_sen_trend`` (median of ALL pairwise slopes) breaks
    down at 29% contamination; the repeated-medians construction
    reaches the maximal 50% — the slope that survives even when half
    the calendar is corrupted (backfills, outages), which is exactly
    the regime data-quality incidents create.

    Exactness: every pairwise slope quantizes half-up at micro from
    exact integer rise/run (sign handled symmetrically so slope(i,j)
    = slope(j,i) exactly); the per-day median is the exact low-median
    order statistic over the day's slope partition (2 rn >= cnt + 1);
    the outer median comes off the bounded distinct-median-value
    cumulative.

    Scale shape: calendar-bounded — the slope fan is the calendar
    squared (~5.8M pairs at 2.4k days), partitioned per day for the
    inner medians (day-keyed windows, never SinglePartition); the
    outer median is the value-grid class (allowlist entry at
    activation). 1 row out.
    """
    from pyspark.sql.window import Window

    from .roundeleven2 import _daily_counts_idx

    t = Tables(spark, sf_dir)
    idx = _daily_counts_idx(t).select(
        F.col("k").cast("long").alias("k"), F.col("y").cast("long").alias("y")
    )
    b = idx.select(F.col("k").alias("kb"), F.col("y").alias("yb"))
    rise = _dec(F.col("y") - F.col("yb"))
    run = _dec(F.abs(F.col("k") - F.col("kb")))
    mag = _halfup_div(F.lit(1_000_000).cast("decimal(38,0)") * F.abs(rise), run)
    signed = (
        F.when(rise < 0, -mag).otherwise(mag)
        * F.when(F.col("k") > F.col("kb"), F.lit(1)).otherwise(F.lit(-1))
    ).cast("long")
    # calendar-bounded pair fan: broadcast the ~2.4k-day table (BNLJ
    # over days, never a CartesianProduct over facts)
    slopes = (
        idx.crossJoin(F.broadcast(b))
        .where(F.col("k") != F.col("kb"))
        .select(F.col("k").alias("i"), signed.alias("s_micro"))
    )
    wp = Window.partitionBy("i").orderBy("s_micro")
    wc = Window.partitionBy("i")
    permed = slopes.select(
        "i",
        "s_micro",
        F.row_number().over(wp).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    imed = (
        permed.where(2 * F.col("rn") >= F.col("cnt") + 1)
        .groupBy("i")
        .agg(F.min("s_micro").alias("med_i"))
    )
    mvals = imed.groupBy("med_i").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wv = Window.orderBy("med_i").rowsBetween(Window.unboundedPreceding, 0)
    mcum = mvals.select("med_i", F.sum("cnt").over(wv).alias("cle"))
    nn = imed.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return mcum.crossJoin(F.broadcast(nn)).agg(
        F.max("n").alias("n_days"),
        F.min(F.when(2 * F.col("cle") >= F.col("n"), F.col("med_i"))).alias(
            "siegel_slope_micro"
        ),
    )


# ---------------------------------------------------------------------------
# 2. Modified z-score (MAD) outlier days
# ---------------------------------------------------------------------------

MODZ_THRESH_MILLI = 3500  # Iglewicz-Hoaglin |M| > 3.5
MODZ_C_MILLI = 6745  # 0.6745 consistency constant, exact milli


def _modz_oracle() -> str:
    return """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), nn AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM daily
    ), vals AS (
      SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM daily GROUP BY y
    ), cumv AS (
      SELECT a.y, CAST(coalesce(sum(b.cnt), 0) + a.cnt AS BIGINT) AS cle
      FROM vals a LEFT JOIN vals b ON b.y < a.y GROUP BY a.y, a.cnt
    ), med AS (
      SELECT min(y) AS m FROM cumv, nn WHERE 2 * cle >= n
    ), dvals AS (
      SELECT abs(d.y - med.m) AS ad, CAST(count(*) AS BIGINT) AS cnt
      FROM daily d, med GROUP BY 1
    ), dcum AS (
      SELECT a.ad, CAST(coalesce(sum(b.cnt), 0) + a.cnt AS BIGINT) AS cle
      FROM dvals a LEFT JOIN dvals b ON b.ad < a.ad GROUP BY a.ad, a.cnt
    ), mad AS (
      SELECT min(ad) AS eps FROM dcum, nn WHERE 2 * cle >= n
    ), scored AS (
      SELECT d.day, d.y,
             (CASE WHEN (d.y - med.m) < 0
               THEN -((2::HUGEINT * {C} * abs(d.y - med.m) + mad.eps)
                      // (2::HUGEINT * mad.eps))
               ELSE ((2::HUGEINT * {C} * (d.y - med.m) + mad.eps)
                     // (2::HUGEINT * mad.eps))
              END) AS modz_milli
      FROM daily d, med, mad WHERE mad.eps > 0
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, y AS daily_count,
           CAST(modz_milli AS BIGINT) AS modz_milli
    FROM scored WHERE abs(modz_milli) > {T}
    ORDER BY abs(modz_milli) DESC, day
    """.replace("{C}", str(MODZ_C_MILLI)).replace("{T}", str(MODZ_THRESH_MILLI))


@_queued("events_modified_zscore_outliers", _modz_oracle())
def events_modified_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified z-score outlier days (Iglewicz & Hoaglin 1993): days
    whose order count deviates from the MEDIAN by more than 3.5
    MAD-standardized units, M = 0.6745 (y - median)/MAD. The control
    chart (``dq_control_chart_daily``) and rolling z-score flag
    against MEAN/SD — which the outliers themselves inflate, masking
    all but the worst day; the median/MAD version has a 50% breakdown
    point, so a whole corrupted month cannot hide a single bad day.
    Reported per flagged day with its score, worst first — the direct
    input to a backfill-triage queue.

    Exactness: median and MAD are exact order statistics off the
    bounded distinct-value cumulatives (2 cle >= n); each day's score
    is ONE half-up milli division of exact integers (0.6745 enters as
    the exact milli constant 6745 folded into the numerator);
    degenerate MAD = 0 calendars emit zero rows on both engines.

    Scale shape: calendar-bounded — two value-grid cumulatives
    (allowlist entry at activation); the scoring pass is one
    broadcast join over the daily table. <= a few rows out.
    """
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    vals = daily.groupBy("y").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wv = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    cumv = vals.select("y", F.sum("cnt").over(wv).alias("cle"))
    med = cumv.crossJoin(F.broadcast(nn)).agg(
        F.min(F.when(2 * F.col("cle") >= F.col("n"), F.col("y"))).alias("m")
    )
    dvals = (
        daily.crossJoin(F.broadcast(med))
        .select(F.abs(F.col("y") - F.col("m")).alias("ad"))
        .groupBy("ad")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wd = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, 0)
    dcum = dvals.select("ad", F.sum("cnt").over(wd).alias("cle"))
    mad = dcum.crossJoin(F.broadcast(nn)).agg(
        F.min(F.when(2 * F.col("cle") >= F.col("n"), F.col("ad"))).alias("eps")
    )
    dev = _dec(F.col("y") - F.col("m"))
    mag = _halfup_div(
        F.lit(MODZ_C_MILLI).cast("decimal(38,0)") * F.abs(dev), _dec(F.col("eps"))
    )
    modz = F.when(dev < 0, -mag).otherwise(mag).cast("long")
    scored = (
        daily.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .where(F.col("eps") > 0)
        .select(
            F.date_format(F.col("day"), "yyyy-MM-dd").alias("day"),
            F.col("y").alias("daily_count"),
            modz.alias("modz_milli"),
        )
    )
    return scored.where(F.abs(F.col("modz_milli")) > MODZ_THRESH_MILLI).orderBy(
        F.abs(F.col("modz_milli")).desc(), "day"
    )


# ---------------------------------------------------------------------------
# 3. User-activity Zipf/power-law exponent pair
# ---------------------------------------------------------------------------


def _uzipf_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps

    hd = _sql_halfup_div
    return f"""
    WITH act AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY user_id
    ), nn AS (
      SELECT CAST(count(*) AS HUGEINT) AS n FROM act
    ), vals AS (
      SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM act GROUP BY x
    ), cc AS (
      SELECT a.x, a.cnt,
             CAST(sum(b.cnt) AS BIGINT) AS n_ge
      FROM vals a JOIN vals b ON b.x >= a.x
      GROUP BY a.x, a.cnt
    ), base AS (
      SELECT c.x, c.cnt, c.n_ge, n.n,
             CAST(c.x AS DOUBLE) AS xd,
             CAST(c.n_ge AS DOUBLE) / CAST(n.n AS DOUBLE) AS ccdf
      FROM cc c, nn n
    ), {sql_det_ln_steps('base', 'xd', 'lnx', as_double=True)}
    , {sql_det_ln_steps('lnx_rel', 'ccdf', 'lnc', as_double=True)}
    , q AS (
      SELECT cnt, n,
             CAST(floor(lnx * 1000000.0::DOUBLE + 0.5) AS BIGINT) AS qx,
             CAST(floor(lnc * 1000000.0::DOUBLE + 0.5) AS BIGINT) AS qc
      FROM lnc_rel
    ), ols AS (
      SELECT CAST(sum(cnt) AS HUGEINT) AS w,
             CAST(sum(cnt * qx) AS HUGEINT) AS sx,
             CAST(sum(cnt * qc) AS HUGEINT) AS sy,
             CAST(sum(cnt * qx * CAST(qx AS HUGEINT)) AS HUGEINT) AS sxx,
             CAST(sum(cnt * qx * CAST(qc AS HUGEINT)) AS HUGEINT) AS sxy
      FROM q
    ), mle AS (
      SELECT CAST(sum(cnt * qx) AS HUGEINT) AS sum_lnx,
             CAST(sum(cnt) AS HUGEINT) AS n_users
      FROM q
    )
    SELECT CAST(m.n_users AS BIGINT) AS n_users,
           CASE WHEN m.sum_lnx > 0 THEN
             CAST(1000000 + {hd('1000000000000::HUGEINT * m.n_users', 'm.sum_lnx')}
                  AS BIGINT)
           END AS alpha_mle_micro,
           CASE WHEN o.w * o.sxx - o.sx * o.sx > 0 THEN
             CAST(floor(-(CAST(o.w * o.sxy - o.sx * o.sy AS DOUBLE)
                          / CAST(o.w * o.sxx - o.sx * o.sx AS DOUBLE))
                        * 1000000.0::DOUBLE + 0.5) AS BIGINT)
           END AS ccdf_slope_neg_micro
    FROM ols o, mle m
    """


@_queued("events_user_activity_zipf_alpha", _uzipf_oracle())
def events_user_activity_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent pair for the user-activity distribution
    (events per user): the continuous-approximation MLE
    alpha = 1 + n / sum ln(x_i) at xmin = 1 (Clauset, Shalizi &
    Newman 2009 eq. 3.1) and the log-log CCDF OLS slope (the Zipf
    plot everyone draws; its negation estimates alpha - 1). The GAP
    between the two columns is the classic diagnostic: they agree on
    a genuine power law and diverge on lognormal/exponential-tailed
    activity — which decides whether hot-user mitigation (salting,
    per-user caps) must be designed for unbounded or bounded skew.
    ``events_hill_tail_interevent`` reads inter-arrival tails; this
    reads the per-user volume tail the shuffle planner cares about.

    Exactness: activity counts are exact; both logs are deterministic
    ``det_ln_dbl`` values quantized to micro on the BOUNDED
    distinct-count grid; the weighted OLS sums and the MLE sum are
    exact integer arithmetic over those quantized logs (one mirrored
    double ratio each at the end).

    Scale shape: one fact scan to per-user counts, partial-aggregated
    to the bounded distinct-value grid; the >= join runs on the grid,
    not on users. 1 row out.
    """
    from ..functions.detmath import det_ln_dbl

    t = Tables(spark, sf_dir)
    act = t.events.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("x"))
    nn = act.agg(_dec(F.count(F.lit(1))).alias("n"))
    vals = act.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    b = vals.select(F.col("x").alias("xb"), F.col("cnt").alias("cntb"))
    cc = (
        vals.join(F.broadcast(b), F.col("xb") >= F.col("x"))
        .groupBy("x", "cnt")
        .agg(F.sum("cntb").cast("long").alias("n_ge"))
    )
    base = cc.crossJoin(F.broadcast(nn))
    qx = F.floor(
        det_ln_dbl(F.col("x").cast("double")) * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    qc = F.floor(
        det_ln_dbl(F.col("n_ge").cast("double") / F.col("n").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    q = base.select("cnt", "n", qx.alias("qx"), qc.alias("qc"))
    ols = q.agg(
        F.sum(_dec(F.col("cnt"))).alias("w"),
        F.sum(_dec(F.col("cnt")) * F.col("qx")).alias("sx"),
        F.sum(_dec(F.col("cnt")) * F.col("qc")).alias("sy"),
        F.sum(_dec(F.col("cnt")) * F.col("qx") * F.col("qx")).alias("sxx"),
        F.sum(_dec(F.col("cnt")) * F.col("qx") * F.col("qc")).alias("sxy"),
        F.max("n").alias("n_users"),
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    den = F.col("w") * F.col("sxx") - F.col("sx") * F.col("sx")
    return ols.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.when(
            F.col("sx") > 0,
            (
                F.lit(1_000_000)
                + _halfup_div(
                    F.lit(1_000_000_000_000).cast("decimal(38,0)") * F.col("n_users"),
                    F.col("sx"),
                )
            ).cast(
                "long"
            ),
        ).alias("alpha_mle_micro"),
        F.when(
            den > 0,
            F.floor(
                -(
                    (F.col("w") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                        "double"
                    )
                    / den.cast("double")
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        ).alias("ccdf_slope_neg_micro"),
    )

# ---------------------------------------------------------------------------
# 4. Hilbert-vs-Z-order locality audit (exact unrolled Hilbert transform)
# ---------------------------------------------------------------------------

HILBERT_ORDER = 4  # 16 x 16 grid
PRICE_BUCKET_WIDTH = 25_000


def _hilbert_d(x, y):
    """Spark column: Hilbert curve index of (x, y) on the 2^k x 2^k
    grid, classic xy2d with the rotation unrolled per bit level. Twin
    of :func:`_py_hilbert_d` (the Python reference used by the
    oracle-side precomputed CASE table and the tests)."""
    d = F.lit(0).cast("long")
    for p in range(HILBERT_ORDER - 1, -1, -1):
        s = 1 << p
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        d = d + F.lit(s * s).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        ).cast("long")
        # rotate
        nx = F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)).otherwise(
            x
        )
        ny = F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)).otherwise(
            y
        )
        x, y = nx, ny
    return d


def _py_hilbert_d(x: int, y: int, order: int = HILBERT_ORDER) -> int:
    d = 0
    for p in range(order - 1, -1, -1):
        s = 1 << p
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - y, s - 1 - x
            else:
                x, y = y, x
    return d


def _hilbert_oracle() -> str:
    from .layout import sql_morton_interleave

    hd = _sql_halfup_div
    n = 1 << HILBERT_ORDER
    # the 256-cell Hilbert index is a pure function of the bucket pair:
    # embed it as an exact CASE lookup generated from the Python
    # reference (both engines then share the identical mapping by
    # construction; the Spark side recomputes it with the unrolled
    # bit algorithm, pinned to this table by the tests)
    cases = " ".join(
        f"WHEN db = {xx} AND pb = {yy} THEN {_py_hilbert_d(xx, yy)}"
        for xx in range(n)
        for yy in range(n)
    )
    return f"""
    WITH o AS (
      SELECT o_custkey,
             CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
                  AS BIGINT) % {n} AS db,
             CAST(least(CAST(floor(o_totalprice / {PRICE_BUCKET_WIDTH}.0)
                             AS BIGINT),
                        {n - 1}) AS BIGINT) AS pb
      FROM orders WHERE o_totalprice IS NOT NULL
    ), keyed AS (
      SELECT o_custkey,
             (CASE {cases} END) AS hx,
             {sql_morton_interleave("db", "pb", HILBERT_ORDER)} AS zx
      FROM o
    ), spans AS (
      SELECT o_custkey,
             CAST(max(hx) - min(hx) AS BIGINT) AS span_h,
             CAST(max(zx) - min(zx) AS BIGINT) AS span_z,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM keyed GROUP BY o_custkey HAVING count(*) >= 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST({hd('1000::HUGEINT * sum(span_h)', 'count(*)')} AS BIGINT)
             AS mean_span_hilbert_milli,
           CAST({hd('1000::HUGEINT * sum(span_z)', 'count(*)')} AS BIGINT)
             AS mean_span_zorder_milli,
           CAST({hd('1000000::HUGEINT * sum(CASE WHEN span_h < span_z THEN 1 ELSE 0 END)',
                    'count(*)')} AS BIGINT) AS hilbert_wins_micro
    FROM spans
    """


@_queued("layout_hilbert_locality_audit", _hilbert_oracle())
def layout_hilbert_locality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve vs Z-order locality audit for a customer-centric
    access pattern: bucket each order into a 16 x 16 (order-month x
    price-band) grid, index the cells with BOTH space-filling curves,
    and measure the per-customer index SPAN (how far apart one
    customer's orders land in curve-sorted file order). The Hilbert
    curve has no Z-order "seams" (adjacent cells are always adjacent
    on the curve), so it typically wins on multi-dimensional range
    locality (Moon et al. 2001) — ``layout_zorder_stats`` audits the
    write-side boxes; this op quantifies the read-side benefit of
    upgrading the layout and reports the share of customers whose
    span shrinks.

    Exactness: both curve indices are pure integer bit arithmetic —
    the Morton interleave is the shared ``layout`` helper; the
    Hilbert index is the classic xy2d transform unrolled over the 4
    bit levels (the DuckDB twin pins the identical 256-cell mapping
    via a generated lookup CASE from the same Python reference the
    tests assert against); spans and the three summary ratios are
    exact integer aggregates with half-up divisions.

    Scale shape: one fact scan to (customer, cell indices); a
    customer-keyed aggregate; constant-size summary. 1 row out.
    """
    from .layout import morton_interleave

    t = Tables(spark, sf_dir)
    n = 1 << HILBERT_ORDER
    db = (
        (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
    ).cast("long") % n
    pb = F.least(
        F.floor(F.col("o_totalprice") / PRICE_BUCKET_WIDTH).cast("long"),
        F.lit(n - 1).cast("long"),
    )
    keyed = t.orders.where(F.col("o_totalprice").isNotNull()).select(
        "o_custkey",
        _hilbert_d(db, pb).alias("hx"),
        morton_interleave(db, pb, HILBERT_ORDER).alias("zx"),
    )
    spans = (
        keyed.groupBy("o_custkey")
        .agg(
            (F.max("hx") - F.min("hx")).alias("span_h"),
            (F.max("zx") - F.min("zx")).alias("span_z"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("n_orders") >= 2)
    )
    k1 = F.lit(1000).cast("decimal(38,0)")
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    return spans.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        _halfup_div(k1 * F.sum(_dec(F.col("span_h"))), _dec(F.count(F.lit(1))))
        .cast("long")
        .alias("mean_span_hilbert_milli"),
        _halfup_div(k1 * F.sum(_dec(F.col("span_z"))), _dec(F.count(F.lit(1))))
        .cast("long")
        .alias("mean_span_zorder_milli"),
        _halfup_div(
            m6
            * _dec(
                F.sum(F.when(F.col("span_h") < F.col("span_z"), 1).otherwise(0))
            ),
            _dec(F.count(F.lit(1))),
        )
        .cast("long")
        .alias("hilbert_wins_micro"),
    )


# ---------------------------------------------------------------------------
# 5. Triangle closure-delay histogram (temporal triangle warehouse)
# ---------------------------------------------------------------------------


def _closure_oracle() -> str:
    from .graph import _SQL_TRI_CTES

    return (
        _SQL_TRI_CTES
        + """
    , lio AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey,
             CAST((year(o.o_orderdate) - 1992) * 12 + month(o.o_orderdate) - 1
                  AS BIGINT) AS m
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), edate AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(min(a.m) AS BIGINT) AS fm
      FROM lio a JOIN lio b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ), td AS (
      SELECT t.a, t.b, t.c, e1.fm AS m1, e2.fm AS m2, e3.fm AS m3
      FROM tris t
      JOIN edate e1 ON e1.u = least(t.a, t.b) AND e1.v = greatest(t.a, t.b)
      JOIN edate e2 ON e2.u = least(t.a, t.c) AND e2.v = greatest(t.a, t.c)
      JOIN edate e3 ON e3.u = t.b AND e3.v = t.c
    ), delays AS (
      SELECT greatest(m1, m2, m3)
             - (m1 + m2 + m3 - greatest(m1, m2, m3) - least(m1, m2, m3))
               AS delay_months
      FROM td
    )
    SELECT delay_months, CAST(count(*) AS BIGINT) AS n_triangles
    FROM delays GROUP BY delay_months ORDER BY delay_months
    """
    )


@_queued("graph_triangle_closure_delay", _closure_oracle())
def graph_triangle_closure_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triadic closure-delay histogram: for every triangle in the
    co-purchase graph, date each edge by its FIRST co-order month and
    measure how many months after the second edge the closing (last)
    edge appeared. Delay 0 = the triangle was born closed (one basket
    or same-month baskets); a long tail = genuine temporal closure —
    products that BECOME co-purchased because their neighborhoods
    overlap, which is the empirical basis for link-prediction
    (``graph_adamic_adar_linkpred`` scores exactly these open wedges)
    and the decay horizon for recommendation freshness.

    Exactness: first-co-order months are exact integer min-aggregates
    over the distinct (order, part) pairs; the mid/max extraction is
    exact integer algebra (sum - max - min); the histogram is a
    bounded (<= #months) exact count.

    Scale shape: the edge-date table is the weighted-edge class (one
    equi-self-join on the order key); the triangle join is the
    3-way equi-join of the session triangle warehouse (the Barrat
    shape); the histogram is month-bounded. <= ~84 rows out.
    """
    from .graph import triangle_table

    t = Tables(spark, sf_dir)
    m = (
        (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
    ).cast("long")
    lio = (
        t.lineitem.select("l_orderkey", "l_partkey")
        .distinct()
        .join(
            t.orders.select("o_orderkey", m.alias("m")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_partkey", "m")
    )
    a = lio.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"),
        F.col("m").alias("ma"),
    )
    bb = lio.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"),
        F.col("m").alias("mb"),
    )
    edate = (
        a.join(bb, "ok")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.least(F.min("ma"), F.min("mb")).alias("fm"))
    )
    tris = triangle_table(spark, t, sf_dir)
    e1 = edate.select(F.col("u").alias("u1"), F.col("v").alias("v1"), F.col("fm").alias("m1"))
    e2 = edate.select(F.col("u").alias("u2"), F.col("v").alias("v2"), F.col("fm").alias("m2"))
    e3 = edate.select(F.col("u").alias("u3"), F.col("v").alias("v3"), F.col("fm").alias("m3"))
    td = (
        tris.join(
            e1,
            (F.least("a", "b") == F.col("u1")) & (F.greatest("a", "b") == F.col("v1")),
        )
        .join(
            e2,
            (F.least("a", "c") == F.col("u2")) & (F.greatest("a", "c") == F.col("v2")),
        )
        .join(e3, (F.col("b") == F.col("u3")) & (F.col("c") == F.col("v3")))
    )
    mx = F.greatest("m1", "m2", "m3")
    mn = F.least("m1", "m2", "m3")
    mid = F.col("m1") + F.col("m2") + F.col("m3") - mx - mn
    return (
        td.select((mx - mid).alias("delay_months"))
        .groupBy("delay_months")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .orderBy("delay_months")
    )


# ---------------------------------------------------------------------------
# 6. PSI drift of the classifier score across the train/val hash split
# ---------------------------------------------------------------------------

PSI_BINS = 20


def _psi_split_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps
    from .corpus import _SQL_ID_HASH, TRAIN_CUT, VAL_CUT
    from .ml import _scored_labeled_sql

    width = 10000 // PSI_BINS
    return (
        _scored_labeled_sql()
        + f"""
    , assigned AS (
      SELECT s.score_q,
             CASE WHEN {_SQL_ID_HASH} % 100 < {TRAIN_CUT} THEN 'train'
                  WHEN {_SQL_ID_HASH} % 100 < {VAL_CUT} THEN 'val'
                  ELSE 'test' END AS split
      FROM scored s JOIN documents USING (doc_id)
    ), cells AS (
      SELECT CAST(least(score_q // {width}, {PSI_BINS - 1}) AS BIGINT) AS bin,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS ct,
             CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS cv
      FROM assigned WHERE split IN ('train', 'val') GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cv) AS BIGINT) AS nv
      FROM cells
    ), probs AS (
      SELECT c.bin, c.ct, c.cv, t.nt, t.nv,
             CASE WHEN c.ct > 0 AND c.cv > 0 THEN
               (CAST(c.ct AS DOUBLE) / CAST(t.nt AS DOUBLE))
               / (CAST(c.cv AS DOUBLE) / CAST(t.nv AS DOUBLE))
             END AS rat
      FROM cells c, tot t
    ), {sql_det_ln_steps('probs', 'rat', 'lnr', as_double=True)}
    , terms AS (
      SELECT nt, nv,
             CASE WHEN ct > 0 AND cv > 0 THEN
               CAST(floor((CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE)
                           - CAST(cv AS DOUBLE) / CAST(nv AS DOUBLE)) * lnr
                          * 1000000000.0::DOUBLE + 0.5) AS BIGINT)
             ELSE 0 END AS t_nano,
             CASE WHEN ct = 0 OR cv = 0 THEN 1 ELSE 0 END AS oneside
      FROM lnr_rel
    )
    SELECT (SELECT nt FROM tot) AS n_train, (SELECT nv FROM tot) AS n_val,
           CAST(sum(t_nano) AS BIGINT) AS psi_nano,
           CAST(sum(oneside) AS BIGINT) AS n_oneside_bins
    FROM terms
    """
    )


@_queued("ml_psi_score_split_drift", _psi_split_oracle())
def ml_psi_score_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the classifier score between the
    deterministic train and val hash splits, over the 20-bin score
    grid: PSI = sum (p_t - p_v) ln(p_t / p_v). A random split should
    give PSI ~ 0 (< 0.10 by the standard banking rule of thumb), so
    this doubles as a SPLIT-HEALTH gate — a hash function that leaks
    document length into the split assignment shows up here before
    it poisons every eval. ``dq_psi_value_drift`` monitors FEATURE
    drift over time; this monitors SCORE drift over the split axis,
    with one-sided bins reported rather than epsilon-fudged (the
    epsilon convention makes PSI depend on an arbitrary constant).

    Exactness: bin counts are exact off the shared scored scan joined
    to the exact hash split; each two-sided bin's term uses the
    deterministic ``det_ln_dbl`` on a mirrored double ratio and
    quantizes to nano BEFORE the integer sum; one-sided bins
    contribute exact zero and are counted in their own column.

    Scale shape: one scored scan + broadcast-sized split join,
    partial-aggregated to the 20-bin grid; constant-size algebra
    after. 1 row out.
    """
    from ..functions.detmath import det_ln_dbl
    from .corpus import TRAIN_CUT, VAL_CUT, _id_hash_bucket
    from .ml import _scored_labeled

    t = Tables(spark, sf_dir)
    width = 10000 // PSI_BINS
    b = _id_hash_bucket()
    split = (
        F.when(b < TRAIN_CUT, F.lit("train"))
        .when(b < VAL_CUT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    scored = _scored_labeled(t).select("doc_id", "score_q")
    assigned = scored.join(
        t.documents.select("doc_id", split.alias("split")), "doc_id"
    ).where(F.col("split").isin("train", "val"))
    cells = assigned.groupBy(
        F.least(F.floor(F.col("score_q") / width), F.lit(PSI_BINS - 1))
        .cast("long")
        .alias("bin")
    ).agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long")
        .alias("cv"),
    )
    tot = cells.agg(
        F.sum("ct").cast("long").alias("nt"), F.sum("cv").cast("long").alias("nv")
    )
    probs = cells.crossJoin(F.broadcast(tot))
    pt = F.col("ct").cast("double") / F.col("nt").cast("double")
    pv = F.col("cv").cast("double") / F.col("nv").cast("double")
    two_sided = (F.col("ct") > 0) & (F.col("cv") > 0)
    t_nano = F.when(
        two_sided,
        F.floor((pt - pv) * det_ln_dbl(pt / pv) * F.lit(1e9) + F.lit(0.5)).cast(
            "long"
        ),
    ).otherwise(F.lit(0).cast("long"))
    terms = probs.select(
        "nt",
        "nv",
        t_nano.alias("t_nano"),
        F.when(~two_sided, 1).otherwise(0).alias("oneside"),
    )
    return terms.groupBy().agg(
        F.max("nt").alias("n_train"),
        F.max("nv").alias("n_val"),
        F.sum("t_nano").cast("long").alias("psi_nano"),
        F.sum("oneside").cast("long").alias("n_oneside_bins"),
    )
