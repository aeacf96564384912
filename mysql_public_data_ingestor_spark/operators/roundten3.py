"""Round-10 batch 5: seven oracle-paired operators extending the
warehouse-statistics, ML-quality, time-series, text and corpus
families (VERDICT r9 item 5 follow-through — filling the remaining
driver-window slots under the full gate discipline).

1.  ``stats_durbin_watson_daily`` — Durbin-Watson first-order residual
    autocorrelation test on the daily-revenue OLS trend fit.
2.  ``stats_hurst_rs_daily`` — rescaled-range (R/S) Hurst exponent of
    the daily order-count series over a fixed block-size ladder.
3.  ``events_ccf_types_lags`` — lagged cross-correlation between the
    view and purchase daily series (signed r² at lags −7..7).
4.  ``ml_isotonic_calibration_pav`` — closed-form isotonic (PAV)
    calibration of the hashed classifier over a bounded score-bin
    grid via the max-min prefix-average identity.
5.  ``ml_fairness_threshold_gaps`` — per-language selection-rate /
    TPR / FPR gaps vs global at a fixed decision threshold.
6.  ``text_keyword_log_odds`` — Monroe et al. informative-Dirichlet
    weighted log-odds terms separating the two largest languages.
7.  ``corpus_truncation_loss_curve`` — token loss of chunk-and-drop
    packing at a context-length ladder.

House discipline (same as roundten2): every query is a DataFrame
plan with a DuckDB oracle twin; exact integer/decimal arithmetic
crosses the engine boundary (round_int_ratio / round_big_int_ratio /
det_ln_q twins); global ordered passes run only over bounded
POST-AGGREGATION domains (calendar days, score bins, lag grids) via
broadcast non-equi self-joins or key-partitioned windows — never an
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


def _halfup_div(num, den):
    """Half-up integer division of decimal columns (den > 0), re-signed
    like round_big_int_ratio but returning the INTEGER quotient as
    decimal(38,0) (for further exact arithmetic, not display). Twin of
    the ``CASE WHEN num < 0 THEN -((2*(-num)+den)//(2*den)) ...``
    HUGEINT idiom in the oracles."""
    a = F.lit(2).cast("decimal(38,0)") * _dec(F.abs(num)) + _dec(den)
    b = F.lit(2).cast("decimal(38,0)") * _dec(den)
    mag = (a - a % b) / b
    return _dec(F.when(num < 0, -mag).otherwise(mag))


def _sql_halfup_div(num: str, den: str) -> str:
    mag = f"((2::HUGEINT*abs({num}) + ({den})) // (2::HUGEINT*({den})))"
    return f"(CASE WHEN ({num}) < 0 THEN -{mag} ELSE {mag} END)"


# ---------------------------------------------------------------------------
# 1. Durbin-Watson test on the daily-revenue trend residuals
# ---------------------------------------------------------------------------


def _dw_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    fit_num = "(co.a + co.b * i.k)"
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS HUGEINT) AS y
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT a.day, a.y, CAST(count(*) AS HUGEINT) AS k
      FROM daily a JOIN daily b ON b.day <= a.day
      GROUP BY a.day, a.y
    ), s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(k) AS st,
             sum(k * k) AS stt, sum(y) AS sy, sum(k * y) AS sty
      FROM idx
    ), co AS (
      SELECT n, n * stt - st * st AS d,
             sy * stt - st * sty AS a,
             n * sty - st * sy   AS b
      FROM s
    ), resid AS (
      SELECT i.k,
             i.y - {_sql_halfup_div(fit_num, 'co.d')} AS e
      FROM idx i, co
    ), dsum AS (
      SELECT CAST(sum((a.e - b.e) * (a.e - b.e)) AS HUGEINT) AS sd
      FROM resid a JOIN resid b ON b.k = a.k - 1
    ), esum AS (
      SELECT CAST(sum(e * e) AS HUGEINT) AS se,
             CAST(count(*) AS BIGINT) AS n
      FROM resid
    )
    SELECT esum.n AS n_days,
           {sql_round_big_int_ratio('dsum.sd', 'esum.se')} AS dw
    FROM dsum, esum WHERE esum.se > 0
    """


@register("stats_durbin_watson_daily", oracle=_dw_oracle())
def stats_durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic DW = Σ(e_t − e_{t−1})² / Σe_t² of the
    residuals from the exact OLS trend fit of daily order revenue on
    the day rank — THE classical first-order serial-correlation test
    on regression residuals, complementing the Ljung-Box (raw-series
    portmanteau) and runs tests already in the family: DW asks
    whether the TREND MODEL's errors are independent, not whether the
    series itself is.

    Exactness path: the OLS fit is closed-form integer algebra — with
    D = nΣt²−(Σt)², A = ΣyΣt²−ΣtΣty, B = nΣty−ΣtΣy the fitted value
    at rank k is (A+Bk)/D; residuals are quantized ONCE at WHOLE CENTS
    by the shared half-up integer-division idiom (e_k = y_k −
    halfup(A+Bk, D), decimal(38,0) vs HUGEINT twins), and both DW
    sums then run in exact 128-bit integers with one final
    round_big_int_ratio. Whole-cent (not micro-cent) quantization is
    the magnitude-audit headroom choice: residuals on real data are
    ≥ 10⁶ cents so the relative quantization error is ≤ 10⁻⁶, while
    2·10⁶·Σe² stays ≤ ~10³⁶ even on the value-magnitude fuzz profile
    (5·10⁹-cent days), inside decimal(38)/HUGEINT — the micro-cent
    form overflowed exactly there.

    Scale shape: the fact scan partial-aggregates to the ~2.4k-row
    calendar-day table before anything quadratic runs; the day rank
    comes from the house broadcast non-equi self-join over that
    POST-AGGREGATION table (no global window), and the lag pairing is
    a rank equi-join — the same bounded-domain pattern as
    stats_runs_up_down_daily (roundten2) and events_acf_daily_lags.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        _dec(F.sum(cents)).alias("y")
    )
    b0 = daily.select(F.col("day").alias("day_b"))
    idx = (
        daily.join(F.broadcast(b0), F.col("day_b") <= F.col("day"))
        .groupBy("day", "y")
        .agg(_dec(F.count(F.lit(1))).alias("k"))
    )
    s = idx.agg(
        _dec(F.count(F.lit(1))).alias("n"),
        F.sum("k").alias("st"),
        F.sum(F.col("k") * F.col("k")).alias("stt"),
        F.sum("y").alias("sy"),
        F.sum(F.col("k") * F.col("y")).alias("sty"),
    )
    co = s.select(
        "n",
        (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).alias("d"),
        (F.col("sy") * F.col("stt") - F.col("st") * F.col("sty")).alias("a"),
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).alias("b"),
    )
    fit_num = F.col("a") + F.col("b") * F.col("k")
    resid = idx.crossJoin(F.broadcast(co)).select(
        "k",
        (F.col("y") - _halfup_div(fit_num, F.col("d"))).alias("e"),
    )
    ra = resid.select(F.col("k").alias("k_a"), F.col("e").alias("e_a"))
    rb = resid.select(F.col("k").alias("k_b"), F.col("e").alias("e_b"))
    dsum = ra.join(rb, F.col("k_b") == F.col("k_a") - 1).agg(
        F.sum(
            (F.col("e_a") - F.col("e_b")) * (F.col("e_a") - F.col("e_b"))
        ).alias("sd")
    )
    esum = resid.agg(
        F.sum(F.col("e") * F.col("e")).alias("se"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return (
        esum.crossJoin(F.broadcast(dsum))
        .filter(F.col("se") > 0)
        .select(
            "n_days",
            round_big_int_ratio(F.col("sd"), F.col("se")).alias("dw"),
        )
    )


# ---------------------------------------------------------------------------
# 2. Rescaled-range Hurst exponent of the daily order-count series
# ---------------------------------------------------------------------------

HURST_SIZES = (50, 100, 200, 400)


def _hurst_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps
    from ..functions.exact import sql_round_big_int_ratio

    sizes = ", ".join(str(s) for s in HURST_SIZES)
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT a.day, a.y, CAST(count(*) AS BIGINT) AS k
      FROM daily a JOIN daily b ON b.day <= a.day
      GROUP BY a.day, a.y
    ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
    sizes AS (SELECT CAST(unnest([{sizes}]) AS BIGINT) AS s),
    rows_s AS (
      SELECT s.s, (i.k - 1) // s.s AS blk, i.k, i.y
      FROM idx i JOIN sizes s ON true, nn
      WHERE (i.k - 1) // s.s < nn.n // s.s
    ), cum AS (
      SELECT s, blk, k, y,
             CAST(sum(y) OVER (PARTITION BY s, blk ORDER BY k) AS BIGINT) AS c,
             CAST(sum(y) OVER (PARTITION BY s, blk) AS BIGINT) AS t,
             CAST(row_number() OVER (PARTITION BY s, blk ORDER BY k) AS BIGINT)
               AS i
      FROM rows_s
    ), blocks AS (
      SELECT s, blk,
             max(s * c - i * t) - min(s * c - i * t) AS rs,
             s * s * sum(y * y) - s * t * t AS v
      FROM cum GROUP BY s, blk, t
    ), ok AS (
      SELECT s, blk, rs, v FROM blocks WHERE rs > 0 AND v > 0
    ), {sql_det_ln_steps('ok', 'rs', 'lrs')},
    {sql_det_ln_steps('lrs_rel', 'v', 'lv')},
    {sql_det_ln_steps('lv_rel', 's', 'ls')},
    per_block AS (
      SELECT s, ls, 2 * lrs + ls - lv AS m FROM ls_rel
    ), per_size AS (
      SELECT s, ls, CAST(count(*) AS BIGINT) AS n_blocks,
             {_sql_halfup_div('CAST(sum(m) AS HUGEINT)',
                              '2::HUGEINT * count(*)')} AS mq
      FROM per_block GROUP BY s, ls
    ), fit AS (
      SELECT CAST(count(*) AS HUGEINT) AS p,
             CAST(sum(ls) AS HUGEINT) AS su,
             CAST(sum(ls::HUGEINT * ls) AS HUGEINT) AS suu,
             CAST(sum(mq) AS HUGEINT) AS sm,
             CAST(sum(ls::HUGEINT * mq) AS HUGEINT) AS sum_
      FROM per_size
    )
    SELECT ps.s AS block_size, ps.n_blocks,
           ps.mq / 1000000.0 AS mean_ln_rs,
           ps.ls / 1000000.0 AS ln_size,
           CASE WHEN f.p >= 2 AND f.p * f.suu - f.su * f.su > 0
                THEN {sql_round_big_int_ratio(
                    'f.p * f.sum_ - f.su * f.sm',
                    'f.p * f.suu - f.su * f.su')}
           END AS hurst
    FROM per_size ps, fit f
    """


@register("stats_hurst_rs_daily", oracle=_hurst_oracle())
def stats_hurst_rs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) Hurst exponent of the daily order-count
    series (Hurst 1951 / Mandelbrot-Wallis): for each block size s in
    a fixed ladder, split the day-rank sequence into ⌊n/s⌋ full
    blocks, compute the range R of the mean-adjusted cumulative sums
    and the population s.d. S per block, and regress mean ln(R/S) on
    ln(s) — slope ≈ H (0.5 = random walk, >0.5 persistent). The
    long-memory complement to the variance-ratio test (roundten2):
    VR(5) probes one horizon; R/S fits the whole scaling law.

    Exactness: with integer block sums, s·W_i = s·C_i − i·T is exact,
    R_s = max−min of it, and V = s²Σy² − sT² = s³S² — so
    (R/S)² = R_s²·s/V is a ratio of int64s and ln(R/S) =
    (2L(R_s)+L(s)−L(V))/2 in det_ln_q micro-nats, bit-identical
    across engines (det-ln twins). Per-size means quantize via the
    shared half-up idiom; the 4-point OLS slope is one exact
    round_big_int_ratio. det-ln args stay < 2⁵³ through sf1×10
    (V ≤ s³·ymax² ≈ 2.5·10¹⁵ at 6k orders/day).

    Scale shape: fact scan → calendar-day aggregate (~2.4k rows) →
    broadcast non-equi rank join (house pattern) → per-(size, block)
    KEY-PARTITIONED cumulative windows (never SinglePartition) →
    ≤ Σ⌊n/s⌋ ≈ 90-row block table → 4-row size table → scalar slope.
    Degenerate blocks (R=0 or V=0, constant counts) are excluded
    identically on both engines before the logs.
    """
    from ..functions.detmath import det_ln_q
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    b0 = daily.select(F.col("day").alias("day_b"))
    idx = (
        daily.join(F.broadcast(b0), F.col("day_b") <= F.col("day"))
        .groupBy("day", "y")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    nn = idx.agg(F.count(F.lit(1)).alias("n"))
    sizes = F.explode(
        F.array(*[F.lit(s).cast("long") for s in HURST_SIZES])
    ).alias("s")
    rows_s = (
        idx.crossJoin(F.broadcast(nn))
        .select("k", "y", "n", sizes)
        .withColumn("blk", ((F.col("k") - 1) / F.col("s")).cast("long"))
        .filter(F.col("blk") < (F.col("n") / F.col("s")).cast("long"))
    )
    wo = Window.partitionBy("s", "blk").orderBy("k")
    wa = Window.partitionBy("s", "blk")
    cum = rows_s.select(
        "s",
        "blk",
        "y",
        F.sum("y").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("c"),
        F.sum("y").over(wa).alias("t"),
        F.row_number().over(wo).cast("long").alias("i"),
    )
    w_s = F.col("s") * F.col("c") - F.col("i") * F.col("t")
    blocks = cum.groupBy("s", "blk", "t").agg(
        (F.max(w_s) - F.min(w_s)).alias("rs"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).select(
        "s",
        "blk",
        "rs",
        (
            F.col("s") * F.col("s") * F.col("syy")
            - F.col("s") * F.col("t") * F.col("t")
        ).alias("v"),
    )
    ok = blocks.filter((F.col("rs") > 0) & (F.col("v") > 0))
    per_block = ok.select(
        "s",
        det_ln_q(F.col("s")).alias("ls"),
        (
            F.lit(2) * det_ln_q(F.col("rs"))
            + det_ln_q(F.col("s"))
            - det_ln_q(F.col("v"))
        ).alias("m"),
    )
    per_size = per_block.groupBy("s", "ls").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        _halfup_div(
            _dec(F.sum("m")), F.lit(2).cast("decimal(38,0)") * _dec(F.count(F.lit(1)))
        ).alias("mq"),
    )
    fit = per_size.agg(
        _dec(F.count(F.lit(1))).alias("p"),
        _dec(F.sum("ls")).alias("su"),
        _dec(F.sum(F.col("ls") * F.col("ls"))).alias("suu"),
        F.sum("mq").alias("sm"),
        F.sum(_dec(F.col("ls")) * F.col("mq")).alias("sum_"),
    )
    den = F.col("p") * F.col("suu") - F.col("su") * F.col("su")
    return per_size.crossJoin(F.broadcast(fit)).select(
        F.col("s").alias("block_size"),
        "n_blocks",
        (F.col("mq").cast("long") / F.lit(1e6)).alias("mean_ln_rs"),
        (F.col("ls") / F.lit(1e6)).alias("ln_size"),
        F.when(
            (F.col("p") >= 2) & (den > 0),
            round_big_int_ratio(
                F.col("p") * F.col("sum_") - F.col("su") * F.col("sm"), den
            ),
        ).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# 3. Cross-correlation between the view and purchase daily series
# ---------------------------------------------------------------------------

CCF_MAX_LAG = 7
CCF_TYPE_X = "view"
CCF_TYPE_Y = "purchase"


def _ccf_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
    ), cx AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = '{CCF_TYPE_X}' GROUP BY 1
    ), cy AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = '{CCF_TYPE_Y}' GROUP BY 1
    ), filled AS (
      SELECT days.d, coalesce(cx.c, 0) AS x, coalesce(cy.c, 0) AS y
      FROM days LEFT JOIN cx ON cx.d = days.d LEFT JOIN cy ON cy.d = days.d
    ), idx AS (
      SELECT a.d, a.x, a.y, CAST(count(*) AS BIGINT) AS k
      FROM filled a JOIN filled b ON b.d <= a.d
      GROUP BY a.d, a.x, a.y
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM idx
    ), cent AS (
      SELECT i.k,
             t.n * i.x - t.sx AS zx,
             t.n * i.y - t.sy AS zy
      FROM idx i, tot t
    ), den AS (
      SELECT CAST(sum(zx::HUGEINT * zx) AS HUGEINT) AS zxx,
             CAST(sum(zy::HUGEINT * zy) AS HUGEINT) AS zyy
      FROM cent
    ), lags AS (
      SELECT CAST(unnest(range(-{CCF_MAX_LAG}, {CCF_MAX_LAG + 1})) AS BIGINT) AS l
    ), num AS (
      SELECT l.l AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.zx::HUGEINT * b.zy) AS HUGEINT) AS num
      FROM cent a JOIN lags l ON true
      JOIN cent b ON b.k = a.k + l.l
      GROUP BY l.l
    )
    SELECT n.lag, n.n_pairs,
           CASE WHEN d.zxx > 0 AND d.zyy > 0 THEN
             {sql_round_big_int_ratio(
                 '(CASE WHEN n.num < 0 THEN -1 ELSE 1 END) * n.num * n.num',
                 'd.zxx * d.zyy')}
           END AS ccf_sq
    FROM num n, den d
    """


@register("events_ccf_types_lags", oracle=_ccf_oracle())
def events_ccf_types_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the zero-filled daily VIEW and
    PURCHASE count series at lags −7..+7 — does view traffic LEAD
    purchases (positive-lag peak) or trail it? The two-series
    complement of events_acf_daily_lags, and the classical lead-lag
    screen before any transfer-function / attribution model.

    CCF normalization needs √(Sxx·Syy), so to stay exact the query
    reports the SIGNED SQUARED cross-correlation sign(r)·r² =
    sign(num)·num²/(Zxx·Zyy) — a ratio of exact integers (centered
    values z = n·x − Σx, the ACF op's scaling), quantized once by
    round_big_int_ratio; |r| = √|ccf_sq| for display downstream.
    num² ≤ (n·z_max²)² ≈ 10²⁸ at sf1×10 — inside HUGEINT/decimal(38).

    Scale shape: the fact scan partial-aggregates per (type, day)
    BEFORE anything joins; the day spine and both series are
    calendar-bounded (~30 rows at every sf), zero-filled by left
    joins on the spine so silent gaps can't shrink the overlap; the
    rank comes from the house broadcast non-equi self-join over the
    POST-AGGREGATION spine, and each lag is a rank equi-join against
    the broadcast 15-row lag grid.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    ev = t.events.select(
        F.to_date("ts").alias("d"), "event_type"
    )
    days = ev.select("d").distinct()
    cx = (
        ev.filter(F.col("event_type") == CCF_TYPE_X)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("cx"))
    )
    cy = (
        ev.filter(F.col("event_type") == CCF_TYPE_Y)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("cy"))
    )
    filled = (
        days.join(cx, "d", "left")
        .join(cy, "d", "left")
        .select(
            "d",
            F.coalesce(F.col("cx"), F.lit(0)).alias("x"),
            F.coalesce(F.col("cy"), F.lit(0)).alias("y"),
        )
    )
    b0 = filled.select(F.col("d").alias("d_b"))
    idx = (
        filled.join(F.broadcast(b0), F.col("d_b") <= F.col("d"))
        .groupBy("d", "x", "y")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    tot = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    cent = idx.crossJoin(F.broadcast(tot)).select(
        "k",
        (F.col("n") * F.col("x") - F.col("sx")).alias("zx"),
        (F.col("n") * F.col("y") - F.col("sy")).alias("zy"),
    )
    den = cent.agg(
        F.sum(_dec(F.col("zx")) * _dec(F.col("zx"))).alias("zxx"),
        F.sum(_dec(F.col("zy")) * _dec(F.col("zy"))).alias("zyy"),
    )
    lags = F.explode(
        F.array(
            *[F.lit(l).cast("long") for l in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1)]
        )
    ).alias("l")
    a = cent.select(F.col("k").alias("k_a"), F.col("zx").alias("zx_a")).select(
        "k_a", "zx_a", lags
    )
    b = cent.select(F.col("k").alias("k_b"), F.col("zy").alias("zy_b"))
    num = (
        a.join(b, F.col("k_b") == F.col("k_a") + F.col("l"))
        .groupBy(F.col("l").alias("lag"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(_dec(F.col("zx_a")) * _dec(F.col("zy_b"))).alias("num"),
        )
    )
    sign = F.when(F.col("num") < 0, F.lit(-1)).otherwise(F.lit(1)).cast(
        "decimal(38,0)"
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.when(
            (F.col("zxx") > 0) & (F.col("zyy") > 0),
            round_big_int_ratio(
                sign * F.col("num") * F.col("num"),
                F.col("zxx") * F.col("zyy"),
            ),
        ).alias("ccf_sq"),
    )


# ---------------------------------------------------------------------------
# 4. Isotonic (PAV) calibration over a bounded score-bin grid
# ---------------------------------------------------------------------------

ISO_BINS = 20


# Shared CTE chain from the scored corpus to the PAV minimax fit
# (bins/pre/segs/inner_min/fit) — consumed by the isotonic op below
# AND the PAV-vs-ROC-hull audit in roundtwelve9.py (one derivation,
# two consumers). Append after _scored_labeled_sql().
def _sql_iso_fit_ctes() -> str:
    b = ISO_BINS
    return f"""
    bins AS (
      SELECT CAST(least(score_q // {10000 // b}, {b - 1}) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(label) AS BIGINT) AS pos
      FROM scored GROUP BY 1
    ), pre AS (
      SELECT a.bin, a.n, a.pos,
             CAST(count(*) AS BIGINT) AS r,
             CAST(sum(b.n) AS BIGINT) AS cn,
             CAST(sum(b.pos) AS BIGINT) AS cp
      FROM bins a JOIN bins b ON b.bin <= a.bin
      GROUP BY a.bin, a.n, a.pos
    ), segs AS (
      SELECT i.r AS ri, j.r AS rj,
             (j.cp - i.cp + i.pos) AS p,
             (j.cn - i.cn + i.n) AS nn
      FROM pre i JOIN pre j ON j.r >= i.r
    ), inner_min AS (
      SELECT k.bin, k.n, k.pos, s.ri, min(s.p / s.nn) AS mn
      FROM pre k JOIN segs s ON s.ri <= k.r AND s.rj >= k.r
      GROUP BY k.bin, k.n, k.pos, s.ri
    ), fit AS (
      SELECT bin, n, pos, max(mn) AS v
      FROM inner_min GROUP BY bin, n, pos
    )
    """


def _iso_oracle() -> str:
    from .ml import _scored_labeled_sql
    from ..functions.exact import sql_round_int_ratio

    return (
        _scored_labeled_sql()
        + ", "
        + _sql_iso_fit_ctes()
        + f"""
    SELECT bin, n, pos,
           {sql_round_int_ratio('pos', 'n')} AS raw_rate,
           CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS iso_rate
    FROM fit
    """
    )


@register("ml_isotonic_calibration_pav", oracle=_iso_oracle())
def ml_isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic-regression (PAV) calibration of the hashed-feature
    classifier against the rule gate over a fixed 20-bin score grid —
    the nonparametric companion to the Platt-style linear recalibration
    (ml_calibration_slope_intercept) and the reliability diagram: the
    fitted value is the best MONOTONE probability curve in L².

    Instead of the sequential pool-adjacent-violators sweep (useless
    on a cluster), the fit uses the closed-form minimax identity
    v_k = max_{i≤k} min_{j≥k} (pos(i..j)/n(i..j)) over PREFIX SUMS —
    an O(B³) dataflow over the B=20-bin POST-AGGREGATION grid (≤ 210
    segment rows, ≤ 4.2k candidate rows TOTAL, regardless of corpus
    size), so the heavy work is one partial-aggregated scan of the
    documents. Segment averages compare as p/n int64→double divisions
    (one correctly-rounded IEEE op, bit-identical cross-engine;
    distinct fractions with denominators ≤ corpus size are separated
    by ≥ 1/n² ≫ double ulp, so min/max never straddle a rounding
    ambiguity); the output quantizes once at 1e-6. The replica test
    asserts the fitted curve is monotone and matches a reference PAV.
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    fit = _iso_fit(_iso_bins(t))
    return fit.select(
        "bin",
        "n",
        "pos",
        round_int_ratio(F.col("pos"), F.col("n")).alias("raw_rate"),
        (
            F.floor(F.col("v") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
            / F.lit(1e6)
        ).alias("iso_rate"),
    )


def _iso_bins(t: Tables):
    """(bin, n, pos) over the fixed ISO_BINS score grid — shared with
    the PAV/hull audit in roundtwelve9.py."""
    from .ml import _scored_labeled

    b = ISO_BINS
    s = _scored_labeled(t)
    return s.groupBy(
        F.least(F.floor(F.col("score_q") / F.lit(10000 // b)), F.lit(b - 1))
        .cast("long")
        .alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos"))


def _iso_fit(bins):
    """PAV fit via the prefix-sum minimax identity over the bounded
    bin grid -> (bin, n, pos, v double). Shared Spark twin of
    ``_sql_iso_fit_ctes``."""
    bb = bins.select(
        F.col("bin").alias("bin_b"), F.col("n").alias("n_b"), F.col("pos").alias("p_b")
    )
    pre = (
        bins.join(F.broadcast(bb), F.col("bin_b") <= F.col("bin"))
        .groupBy("bin", "n", "pos")
        .agg(
            F.count(F.lit(1)).alias("r"),
            F.sum("n_b").alias("cn"),
            F.sum("p_b").alias("cp"),
        )
    )
    pi = pre.select(
        F.col("r").alias("ri"),
        F.col("cn").alias("cn_i"),
        F.col("cp").alias("cp_i"),
        F.col("n").alias("n_i"),
        F.col("pos").alias("p_i"),
    )
    pj = pre.select(
        F.col("r").alias("rj"), F.col("cn").alias("cn_j"), F.col("cp").alias("cp_j")
    )
    segs = pi.join(F.broadcast(pj), F.col("rj") >= F.col("ri")).select(
        "ri",
        "rj",
        (F.col("cp_j") - F.col("cp_i") + F.col("p_i")).alias("p"),
        (F.col("cn_j") - F.col("cn_i") + F.col("n_i")).alias("nn"),
    )
    k = pre.select("bin", "n", "pos", F.col("r").alias("rk"))
    cand = k.join(
        F.broadcast(segs),
        (F.col("ri") <= F.col("rk")) & (F.col("rj") >= F.col("rk")),
    ).select("bin", "n", "pos", "ri", (F.col("p") / F.col("nn")).alias("val"))
    inner = cand.groupBy("bin", "n", "pos", "ri").agg(F.min("val").alias("mn"))
    return inner.groupBy("bin", "n", "pos").agg(F.max("mn").alias("v"))


# ---------------------------------------------------------------------------
# 5. Fairness gaps at a fixed decision threshold
# ---------------------------------------------------------------------------

FAIR_THRESHOLD = 5000


def _fairness_oracle() -> str:
    from .ml import _scored_labeled_sql

    th = FAIR_THRESHOLD

    def rates(prefix: str) -> str:
        return f"""
             CAST(count(*) AS BIGINT) AS {prefix}n,
             CAST(sum(CASE WHEN score_q >= {th} THEN 1 ELSE 0 END) AS BIGINT)
               AS {prefix}sel,
             CAST(sum(label) AS BIGINT) AS {prefix}pos,
             CAST(sum(CASE WHEN score_q >= {th} AND label = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS {prefix}tp,
             CAST(sum(CASE WHEN score_q >= {th} AND label = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS {prefix}fp"""

    def hq(num: str, den: str) -> str:
        # half-up 1e-6 quantized ratio as the INTEGER magnitude (not
        # yet divided) so gap arithmetic stays in exact int64 space
        return f"((2000000::BIGINT*({num}) + ({den})) // (2*({den})))"

    return (
        _scored_labeled_sql()
        + f"""
    , per_lang AS (
      SELECT lang, {rates('')}
      FROM scored GROUP BY lang
    ), gstats AS (
      SELECT {rates('g_')}
      FROM scored
    ), q AS (
      SELECT l.lang, l.n, l.sel, l.pos,
             {hq('l.sel', 'l.n')} AS selq,
             CASE WHEN l.pos > 0 THEN {hq('l.tp', 'l.pos')} END AS tprq,
             CASE WHEN l.n - l.pos > 0 THEN {hq('l.fp', 'l.n - l.pos')} END
               AS fprq,
             {hq('g.g_sel', 'g.g_n')} AS g_selq,
             CASE WHEN g.g_pos > 0 THEN {hq('g.g_tp', 'g.g_pos')} END AS g_tprq,
             CASE WHEN g.g_n - g.g_pos > 0
                  THEN {hq('g.g_fp', 'g.g_n - g.g_pos')} END AS g_fprq
      FROM per_lang l, gstats g
    )
    SELECT lang, n, sel, pos,
           selq / 1000000.0 AS sel_rate,
           tprq / 1000000.0 AS tpr,
           fprq / 1000000.0 AS fpr,
           (selq - g_selq) / 1000000.0 AS dp_gap,
           CASE WHEN tprq IS NOT NULL AND fprq IS NOT NULL
                 AND g_tprq IS NOT NULL AND g_fprq IS NOT NULL
                THEN greatest(abs(tprq - g_tprq), abs(fprq - g_fprq)) / 1000000.0
           END AS eo_gap
    FROM q
    """
    )


@register("ml_fairness_threshold_gaps", oracle=_fairness_oracle())
def ml_fairness_threshold_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of the hashed classifier at the deployed
    decision threshold (score_q ≥ 5000): per-language selection rate,
    TPR and FPR against the rule-gate label, plus the two standard
    gaps vs the global rates — demographic-parity gap (selection-rate
    difference) and an equalized-odds gap (max of |ΔTPR|, |ΔFPR|).
    The per-language AUC (ml_auc_by_lang) asks whether RANKING quality
    is even across groups; this asks whether the DECISION at the
    chosen operating point is — a filter can have equal AUC everywhere
    and still select one language at twice the rate.

    One partial-aggregated scan of the documents produces both the
    per-lang (≤ 5 rows) and global sufficient statistics; rates are
    exact half-up 1e-6 quantities (round_int_ratio) so the gap
    subtractions are differences of identical doubles on both engines.
    Degenerate groups (no positives / no negatives) yield NULL TPR/FPR
    and NULL eo_gap identically. Gap arithmetic runs on the INTEGER
    1e-6 magnitudes (one final /10⁶ division per output) — subtracting
    two already-divided doubles would reintroduce the engine-rounding
    flake round_int_ratio exists to kill.
    """
    from .ml import _scored_labeled

    th = FAIR_THRESHOLD
    t = Tables(spark, sf_dir)
    s = _scored_labeled(t)
    sel = F.when(F.col("score_q") >= th, 1).otherwise(0)

    def hq(num, den):
        # non-negative counts: half-up integer magnitude of num/den 1e-6
        a = F.lit(2000000) * num + den
        b = F.lit(2) * den
        return ((a - a % b) / b).cast("long")

    def aggs():
        return [
            F.count(F.lit(1)).alias("n"),
            F.sum(sel).alias("sel"),
            F.sum("label").alias("pos"),
            F.sum(sel * F.col("label")).alias("tp"),
            F.sum(sel * (1 - F.col("label"))).alias("fp"),
        ]

    per_lang = s.groupBy("lang").agg(*aggs())
    glob = s.agg(*aggs()).select(
        hq(F.col("sel"), F.col("n")).alias("g_selq"),
        F.when(F.col("pos") > 0, hq(F.col("tp"), F.col("pos"))).alias("g_tprq"),
        F.when(
            F.col("n") - F.col("pos") > 0,
            hq(F.col("fp"), F.col("n") - F.col("pos")),
        ).alias("g_fprq"),
    )
    q = per_lang.crossJoin(F.broadcast(glob)).select(
        "lang",
        "n",
        "sel",
        "pos",
        hq(F.col("sel"), F.col("n")).alias("selq"),
        F.when(F.col("pos") > 0, hq(F.col("tp"), F.col("pos"))).alias("tprq"),
        F.when(
            F.col("n") - F.col("pos") > 0,
            hq(F.col("fp"), F.col("n") - F.col("pos")),
        ).alias("fprq"),
        "g_selq",
        "g_tprq",
        "g_fprq",
    )
    m = F.lit(1e6)
    return q.select(
        "lang",
        "n",
        "sel",
        "pos",
        (F.col("selq") / m).alias("sel_rate"),
        (F.col("tprq") / m).alias("tpr"),
        (F.col("fprq") / m).alias("fpr"),
        ((F.col("selq") - F.col("g_selq")) / m).alias("dp_gap"),
        F.when(
            F.col("tprq").isNotNull()
            & F.col("fprq").isNotNull()
            & F.col("g_tprq").isNotNull()
            & F.col("g_fprq").isNotNull(),
            F.greatest(
                F.abs(F.col("tprq") - F.col("g_tprq")),
                F.abs(F.col("fprq") - F.col("g_fprq")),
            )
            / m,
        ).alias("eo_gap"),
    )


# ---------------------------------------------------------------------------
# 6. Weighted log-odds keywords between the two largest languages
# ---------------------------------------------------------------------------

LOGODDS_ALPHA0 = 200
LOGODDS_TOPK = 20


def _logodds_oracle() -> str:
    from .corpus import _SQL_TOKENS
    from ..functions.detmath import sql_det_ln_steps

    a0 = LOGODDS_ALPHA0
    return f"""
    WITH toks AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS token FROM documents
    ), lc AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ), rk AS (
      SELECT a.lang, CAST(count(*) AS BIGINT) AS rnk
      FROM lc a JOIN lc b
        ON b.n_docs > a.n_docs OR (b.n_docs = a.n_docs AND b.lang <= a.lang)
      GROUP BY a.lang
    ), pair AS (
      SELECT max(CASE WHEN rnk = 1 THEN lang END) AS lang_a,
             max(CASE WHEN rnk = 2 THEN lang END) AS lang_b
      FROM rk
    ), cnt AS (
      SELECT t.lang, t.token, CAST(count(*) AS BIGINT) AS c
      FROM toks t, pair p
      WHERE t.lang IN (p.lang_a, p.lang_b)
      GROUP BY t.lang, t.token
    ), tots AS (
      SELECT CAST(sum(CASE WHEN c1.lang = p.lang_a THEN c1.c ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(sum(CASE WHEN c1.lang = p.lang_b THEN c1.c ELSE 0 END)
                  AS BIGINT) AS n2
      FROM cnt c1, pair p
    ), wide AS (
      SELECT token,
             CAST(sum(CASE WHEN c.lang = p.lang_a THEN c.c ELSE 0 END)
                  AS BIGINT) AS y1,
             CAST(sum(CASE WHEN c.lang = p.lang_b THEN c.c ELSE 0 END)
                  AS BIGINT) AS y2
      FROM cnt c, pair p
      GROUP BY token
    ), args AS (
      SELECT w.token, w.y1, w.y2, t.n1, t.n2,
             w.y1 * (t.n1 + t.n2) + {a0} * (w.y1 + w.y2) AS a1,
             (t.n1 + {a0}) * (t.n1 + t.n2)
               - (w.y1 * (t.n1 + t.n2) + {a0} * (w.y1 + w.y2)) AS b1,
             w.y2 * (t.n1 + t.n2) + {a0} * (w.y1 + w.y2) AS a2,
             (t.n2 + {a0}) * (t.n1 + t.n2)
               - (w.y2 * (t.n1 + t.n2) + {a0} * (w.y1 + w.y2)) AS b2
      FROM wide w, tots t
    ), pos_ AS (
      SELECT * FROM args WHERE a1 > 0 AND b1 > 0 AND a2 > 0 AND b2 > 0
    ), {sql_det_ln_steps('pos_', 'a1', 'la1')},
    {sql_det_ln_steps('la1_rel', 'b1', 'lb1')},
    {sql_det_ln_steps('lb1_rel', 'a2', 'la2')},
    {sql_det_ln_steps('la2_rel', 'b2', 'lb2')},
    scored2 AS (
      -- every float literal is ::DOUBLE-cast: DuckDB parses a bare
      -- decimal literal as DECIMAL, which would turn the int*1e-6
      -- step into exact-decimal arithmetic while Spark runs IEEE
      -- doubles (the detmath.py trap)
      SELECT token, y1, y2, n1, n2,
             (la1 - lb1 - la2 + lb2) AS dq,
             CAST(la1 - lb1 - la2 + lb2 AS DOUBLE) * 0.000001::DOUBLE
               AS ddbl,
             ((n1 + n2)::DOUBLE / a1::DOUBLE)
               + ((n1 + n2)::DOUBLE / a2::DOUBLE) AS vdbl
      FROM lb2_rel
    ), zs AS (
      SELECT token, y1, y2, dq,
             CAST(floor(ddbl * ddbl / vdbl * 1000000.0::DOUBLE + 0.5::DOUBLE)
                  AS BIGINT) AS z2q
      FROM scored2
    )
    SELECT z.token, p.lang_a, p.lang_b, z.y1 AS count_a, z.y2 AS count_b,
           z.dq / 1000000.0 AS delta_ln,
           z.z2q / 1000000.0 AS z_squared
    FROM zs z, pair p
    ORDER BY z.z2q DESC, z.token
    LIMIT {LOGODDS_TOPK}
    """


@register("text_keyword_log_odds", oracle=_logodds_oracle())
def text_keyword_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe/Colaresi/Quinn "Fightin' Words" weighted log-odds with
    an informative Dirichlet prior: the top terms separating the two
    LARGEST languages (by doc count; count-desc/lang-asc rank over the
    ≤5-row language table), scored by z² = δ²/Var(δ) where δ is the
    prior-smoothed log-odds-ratio difference and the prior α_w =
    α₀·(y₁+y₂)/N is the pooled distribution. The standard
    corpus-comparison keyword statistic — raw log-odds overweights
    rare terms, tf-idf ignores the comparison corpus; this is the
    member the text family lacked beside PMI, tf-idf and burstiness.

    Exactness: all four log arguments are exact integers after
    clearing the α denominator by N (a₁ = y₁N + α₀(y₁+y₂), …), each
    ln via the det_ln_q twins; δ in micro-nats is an int64 sum. The
    variance uses two int64→double divisions N/a (each one correctly-
    rounded IEEE op on exactly-representable ints — args ≤ N² ≲ 10¹⁴
    through sf1, under 2⁵³), identical association order in the SQL
    twin; z² quantizes once at 1e-6 and top-k orders by (z²_q desc,
    token asc) — fully deterministic tie-breaking on both engines.

    Scale shape: token explosion partial-aggregates to the
    vocabulary-bounded (lang, token) grid; the two-language restriction
    and totals ride a broadcast 1-row pair; global top-20 is a
    TakeOrderedAndProject, never a full sort.
    """
    from ..functions.detmath import det_ln_q
    from ..functions.textnorm import whitespace_tokens

    a0 = LOGODDS_ALPHA0
    t = Tables(spark, sf_dir)
    lc = t.documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    lcb = lc.select(F.col("lang").alias("lang_b"), F.col("n_docs").alias("nd_b"))
    rk = (
        lc.join(
            F.broadcast(lcb),
            (F.col("nd_b") > F.col("n_docs"))
            | ((F.col("nd_b") == F.col("n_docs")) & (F.col("lang_b") <= F.col("lang"))),
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("rnk"))
    )
    pair = rk.agg(
        F.max(F.when(F.col("rnk") == 1, F.col("lang"))).alias("lang_a"),
        F.max(F.when(F.col("rnk") == 2, F.col("lang"))).alias("lang_b"),
    )
    toks = t.documents.select(
        "lang", F.explode(whitespace_tokens(F.col("text"))).alias("token")
    )
    cnt = (
        toks.crossJoin(F.broadcast(pair))
        .filter((F.col("lang") == F.col("lang_a")) | (F.col("lang") == F.col("lang_b")))
        .groupBy("lang", "lang_a", "lang_b", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tots = cnt.agg(
        F.sum(F.when(F.col("lang") == F.col("lang_a"), F.col("c")).otherwise(0)).alias(
            "n1"
        ),
        F.sum(F.when(F.col("lang") == F.col("lang_b"), F.col("c")).otherwise(0)).alias(
            "n2"
        ),
    )
    wide = cnt.groupBy("token", "lang_a", "lang_b").agg(
        F.sum(F.when(F.col("lang") == F.col("lang_a"), F.col("c")).otherwise(0)).alias(
            "y1"
        ),
        F.sum(F.when(F.col("lang") == F.col("lang_b"), F.col("c")).otherwise(0)).alias(
            "y2"
        ),
    )
    nn = F.col("n1") + F.col("n2")
    yw = F.col("y1") + F.col("y2")
    args = wide.crossJoin(F.broadcast(tots)).select(
        "token",
        "lang_a",
        "lang_b",
        "y1",
        "y2",
        "n1",
        "n2",
        (F.col("y1") * nn + F.lit(a0) * yw).alias("a1"),
        ((F.col("n1") + F.lit(a0)) * nn - (F.col("y1") * nn + F.lit(a0) * yw)).alias(
            "b1"
        ),
        (F.col("y2") * nn + F.lit(a0) * yw).alias("a2"),
        ((F.col("n2") + F.lit(a0)) * nn - (F.col("y2") * nn + F.lit(a0) * yw)).alias(
            "b2"
        ),
    )
    pos = args.filter(
        (F.col("a1") > 0) & (F.col("b1") > 0) & (F.col("a2") > 0) & (F.col("b2") > 0)
    )
    dq = (
        det_ln_q(F.col("a1"))
        - det_ln_q(F.col("b1"))
        - det_ln_q(F.col("a2"))
        + det_ln_q(F.col("b2"))
    )
    scored = pos.select(
        "token",
        "lang_a",
        "lang_b",
        "y1",
        "y2",
        dq.alias("dq"),
        (
            (F.col("n1") + F.col("n2")).cast("double") / F.col("a1").cast("double")
            + (F.col("n1") + F.col("n2")).cast("double") / F.col("a2").cast("double")
        ).alias("vdbl"),
    )
    ddbl = F.col("dq") * F.lit(0.000001)
    zs = scored.select(
        "token",
        "lang_a",
        "lang_b",
        "y1",
        "y2",
        "dq",
        F.floor(ddbl * ddbl / F.col("vdbl") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("z2q"),
    )
    return (
        zs.orderBy(F.col("z2q").desc(), F.col("token").asc())
        .limit(LOGODDS_TOPK)
        .select(
            "token",
            "lang_a",
            "lang_b",
            F.col("y1").alias("count_a"),
            F.col("y2").alias("count_b"),
            (F.col("dq") / F.lit(1e6)).alias("delta_ln"),
            (F.col("z2q") / F.lit(1e6)).alias("z_squared"),
        )
    )


# ---------------------------------------------------------------------------
# 7. Token loss of chunk-and-drop packing at a context-length ladder
# ---------------------------------------------------------------------------

TRUNC_LENGTHS = (64, 128, 256, 512)


def _trunc_oracle() -> str:
    from .corpus import _SQL_TOKENS
    from ..functions.exact import sql_round_int_ratio

    lens = ", ".join(str(x) for x in TRUNC_LENGTHS)
    return f"""
    WITH dc AS (
      SELECT CAST(len({_SQL_TOKENS}) AS BIGINT) AS c
      FROM documents
      WHERE len({_SQL_TOKENS}) >= 1
    ), grid AS (
      SELECT d.c, CAST(l.l AS BIGINT) AS l
      FROM dc d JOIN (SELECT unnest([{lens}]) AS l) l ON true
    ), kept AS (
      SELECT l, c,
             (c // l) * l
               + CASE WHEN c % l >= l // 4 THEN c % l ELSE 0 END AS k,
             CASE WHEN c % l > 0 AND c % l < l // 4 THEN 1 ELSE 0 END
               AS tail_dropped
      FROM grid
    )
    SELECT l AS context_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tail_dropped) AS BIGINT) AS docs_tail_dropped,
           CAST(sum(c) AS BIGINT) AS tokens_total,
           CAST(sum(k) AS BIGINT) AS tokens_kept,
           CAST(sum(c - k) AS BIGINT) AS tokens_dropped,
           CAST(sum(c // l) AS BIGINT) AS full_chunks,
           {sql_round_int_ratio('sum(c - k)', 'sum(c)')} AS loss_ratio
    FROM kept GROUP BY l
    """


@register("corpus_truncation_loss_curve", oracle=_trunc_oracle())
def corpus_truncation_loss_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-loss curve of the chunk-and-drop packing policy at a
    context-length ladder (64/128/256/512): each document is split
    into ⌊c/L⌋ full chunks plus a tail of c mod L tokens, and the tail
    is KEPT only when it reaches L/4 (shorter fragments train badly
    and waste padding). Reports, per L, the documents whose tail is
    dropped, exact token totals, and the loss ratio — the standard
    what-if table before committing a corpus to a context length;
    corpus_pack_sequences plans the actual packing, this prices the
    policy across candidate lengths.

    Pure integer arithmetic per (doc, L) cell (floor-div / mod), one
    partial-aggregated pass: the token-count scan aggregates to one
    row per document-length, the 4-element ladder rides an explode
    (no join at all on the Spark side), and the output is 4 rows of
    int64 sums with one exact half-up ratio each. Empty documents
    (zero tokens) are excluded identically on both engines.
    """
    from ..functions.exact import round_int_ratio
    from ..functions.textnorm import whitespace_tokens

    t = Tables(spark, sf_dir)
    dc = t.documents.select(
        F.size(whitespace_tokens(F.col("text"))).cast("long").alias("c")
    ).filter(F.col("c") >= 1)
    grid = dc.select(
        "c",
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in TRUNC_LENGTHS])
        ).alias("l"),
    )
    tail = F.col("c") % F.col("l")
    keep_tail = tail >= (F.col("l") / 4).cast("long")
    kept = grid.select(
        "l",
        "c",
        (
            (F.col("c") / F.col("l")).cast("long") * F.col("l")
            + F.when(keep_tail, tail).otherwise(F.lit(0))
        ).alias("k"),
        F.when((tail > 0) & ~keep_tail, 1).otherwise(0).alias("tail_dropped"),
        (F.col("c") / F.col("l")).cast("long").alias("fc"),
    )
    return kept.groupBy(F.col("l").alias("context_len")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tail_dropped").alias("docs_tail_dropped"),
        F.sum("c").alias("tokens_total"),
        F.sum("k").alias("tokens_kept"),
        F.sum(F.col("c") - F.col("k")).alias("tokens_dropped"),
        F.sum("fc").alias("full_chunks"),
        round_int_ratio(
            F.sum(F.col("c") - F.col("k")), F.sum(F.col("c"))
        ).alias("loss_ratio"),
    )


# ===========================================================================
# Batch 6 (round-10 continuation)
# ===========================================================================


# ---------------------------------------------------------------------------
# 8. Chow structural-break F test on the daily-revenue trend
# ---------------------------------------------------------------------------


def _ols_sums_sql(rel: str, where: str, suffix: str) -> str:
    return f"""
      SELECT CAST(count(*) AS HUGEINT) AS n{suffix},
             CAST(sum(k) AS HUGEINT) AS st{suffix},
             CAST(sum(k * k) AS HUGEINT) AS stt{suffix},
             CAST(sum(y) AS HUGEINT) AS sy{suffix},
             CAST(sum(k * y) AS HUGEINT) AS sty{suffix}
      FROM {rel} {where}"""


def _chow_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS HUGEINT) AS y
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT a.day, a.y, CAST(count(*) AS HUGEINT) AS k
      FROM daily a JOIN daily b ON b.day <= a.day
      GROUP BY a.day, a.y
    ), brk AS (SELECT CAST(count(*) AS HUGEINT) // 2 AS kb FROM idx),
    sp AS ({_ols_sums_sql('idx', '', '')}),
    s1 AS ({_ols_sums_sql('idx, brk', 'WHERE k <= kb', '1')}),
    s2 AS ({_ols_sums_sql('idx, brk', 'WHERE k > kb', '2')}),
    co AS (
      SELECT n, kb,
             n * stt - st * st AS d, sy * stt - st * sty AS a,
             n * sty - st * sy AS b,
             n1, n1 * stt1 - st1 * st1 AS d1, sy1 * stt1 - st1 * sty1 AS a1,
             n1 * sty1 - st1 * sy1 AS b1,
             n2, n2 * stt2 - st2 * st2 AS d2, sy2 * stt2 - st2 * sty2 AS a2,
             n2 * sty2 - st2 * sy2 AS b2
      FROM sp, s1, s2, brk
    ), resid AS (
      SELECT i.k, c.kb, c.n, c.n1, c.n2,
             i.y - {_sql_halfup_div('(c.a + c.b * i.k)', 'c.d')} AS ep,
             i.y - CASE WHEN i.k <= c.kb
                   THEN {_sql_halfup_div('(c.a1 + c.b1 * i.k)', 'c.d1')}
                   ELSE {_sql_halfup_div('(c.a2 + c.b2 * i.k)', 'c.d2')} END AS eu
      FROM idx i, co c
      WHERE c.d > 0 AND c.d1 > 0 AND c.d2 > 0
    ), ssr AS (
      SELECT any_value(n) AS n, any_value(n1) AS n1, any_value(n2) AS n2,
             CAST(sum(ep * ep) AS HUGEINT) AS ssr_p,
             CAST(sum(eu * eu) AS HUGEINT) AS ssr_u
      FROM resid
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(n1 AS BIGINT) AS n_pre, CAST(n2 AS BIGINT) AS n_post,
           CASE WHEN ssr_u > 0 AND n > 4 THEN
             {sql_round_big_int_ratio('(ssr_p - ssr_u) * (n - 4)',
                                      '2::HUGEINT * ssr_u')}
           END AS f_stat,
           CASE WHEN ssr_p > 0 THEN
             {sql_round_big_int_ratio('ssr_u', 'ssr_p')}
           END AS ssr_ratio
    FROM ssr
    """


@register("stats_chow_test_break", oracle=_chow_oracle())
def stats_chow_test_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break F test at the series midpoint: does one
    linear trend explain the daily-revenue series as well as two
    independent trends fit on the halves? F = ((SSR_p − SSR_u)/q) /
    (SSR_u/(n − 2q)) with q = 2 parameters per segment — the
    model-comparison member of the changepoint family (Pettitt and
    CUSUM detect WHERE a level shifts; Chow TESTS a maintained
    hypothesis about a KNOWN break against the pooled fit).

    Same exactness machinery as stats_durbin_watson_daily: pooled and
    per-segment OLS coefficients in closed-form 128-bit integer
    algebra over the rank from the house broadcast non-equi self-join,
    residuals quantized once at whole cents by the shared half-up
    idiom, SSRs as exact integer sums, one round_big_int_ratio each
    for F and the SSR ratio. The segment split rides CASE on the rank
    against the deterministic midpoint kb = n//2 — one pass computes
    all three residual sets; degenerate segments (D = 0) empty the
    output identically on both engines.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        _dec(F.sum(cents)).alias("y")
    )
    b0 = daily.select(F.col("day").alias("day_b"))
    idx = (
        daily.join(F.broadcast(b0), F.col("day_b") <= F.col("day"))
        .groupBy("day", "y")
        .agg(_dec(F.count(F.lit(1))).alias("k"))
    )
    def sums(pred, sfx):
        flt = F.when(pred, F.lit(1)).otherwise(F.lit(0)).cast("decimal(38,0)")
        return [
            F.sum(flt).alias(f"n{sfx}"),
            F.sum(flt * F.col("k")).alias(f"st{sfx}"),
            F.sum(flt * F.col("k") * F.col("k")).alias(f"stt{sfx}"),
            F.sum(flt * F.col("y")).alias(f"sy{sfx}"),
            F.sum(flt * F.col("k") * F.col("y")).alias(f"sty{sfx}"),
        ]

    nn = idx.agg(_dec(F.count(F.lit(1))).alias("n_tot"))
    kb_v = (F.col("n_tot") - F.col("n_tot") % 2) / 2
    brk = nn.select(_dec(kb_v).alias("kb"))
    withb = idx.crossJoin(F.broadcast(brk))
    stats = withb.agg(
        F.max("kb").alias("kb"),
        *sums(F.lit(True), ""),
        *sums(F.col("k") <= F.col("kb"), "1"),
        *sums(F.col("k") > F.col("kb"), "2"),
    )

    def co(sfx):
        n, st, stt, sy, sty = (
            F.col(f"n{sfx}"),
            F.col(f"st{sfx}"),
            F.col(f"stt{sfx}"),
            F.col(f"sy{sfx}"),
            F.col(f"sty{sfx}"),
        )
        return [
            (n * stt - st * st).alias(f"d{sfx}"),
            (sy * stt - st * sty).alias(f"a{sfx}"),
            (n * sty - st * sy).alias(f"b{sfx}"),
        ]

    cos = stats.select(
        "kb", F.col("n").alias("n"), F.col("n1").alias("nn1"),
        F.col("n2").alias("nn2"), *co(""), *co("1"), *co("2")
    )
    j = idx.crossJoin(F.broadcast(cos)).filter(
        (F.col("d") > 0) & (F.col("d1") > 0) & (F.col("d2") > 0)
    )
    ep = F.col("y") - _halfup_div(
        F.col("a") + F.col("b") * F.col("k"), F.col("d")
    )
    eu = F.col("y") - F.when(
        F.col("k") <= F.col("kb"),
        _halfup_div(F.col("a1") + F.col("b1") * F.col("k"), F.col("d1")),
    ).otherwise(
        _halfup_div(F.col("a2") + F.col("b2") * F.col("k"), F.col("d2"))
    )
    ssr = j.select(
        "n", "nn1", "nn2", ep.alias("ep"), eu.alias("eu")
    ).agg(
        F.max("n").alias("n"),
        F.max("nn1").alias("n1"),
        F.max("nn2").alias("n2"),
        F.sum(F.col("ep") * F.col("ep")).alias("ssr_p"),
        F.sum(F.col("eu") * F.col("eu")).alias("ssr_u"),
    )
    return ssr.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("n1").cast("long").alias("n_pre"),
        F.col("n2").cast("long").alias("n_post"),
        F.when(
            (F.col("ssr_u") > 0) & (F.col("n") > 4),
            round_big_int_ratio(
                (F.col("ssr_p") - F.col("ssr_u"))
                * (F.col("n") - F.lit(4).cast("decimal(38,0)")),
                F.lit(2).cast("decimal(38,0)") * F.col("ssr_u"),
            ),
        ).alias("f_stat"),
        F.when(
            F.col("ssr_p") > 0,
            round_big_int_ratio(F.col("ssr_u"), F.col("ssr_p")),
        ).alias("ssr_ratio"),
    )


# ---------------------------------------------------------------------------
# 9. G-test of independence (day-of-week x event type)
# ---------------------------------------------------------------------------


def _gtest_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps

    return f"""
    WITH cells AS (
      SELECT CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
             event_type, CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ), margins AS (
      SELECT c.dow, c.event_type, c.o,
             r.r, col.c, t.n
      FROM cells c
      JOIN (SELECT dow, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY dow) r
        ON r.dow = c.dow
      JOIN (SELECT event_type, CAST(sum(o) AS BIGINT) AS c FROM cells
            GROUP BY event_type) col
        ON col.event_type = c.event_type
      JOIN (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells) t ON true
    ), args AS (
      SELECT dow, event_type, o, r, c, n,
             o * n AS arg_on, r * c AS arg_rc
      FROM margins
    ), {sql_det_ln_steps('args', 'arg_on', 'lon')},
    {sql_det_ln_steps('lon_rel', 'arg_rc', 'lrc')},
    terms AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT dow) AS BIGINT) AS nr,
             CAST(count(DISTINCT event_type) AS BIGINT) AS nc,
             CAST(sum(o * (lon - lrc)) AS BIGINT) AS gsum
      FROM lrc_rel
    )
    SELECT n, (nr - 1) * (nc - 1) AS df,
           CAST(2 * gsum AS BIGINT) / 1000000.0 AS g_stat
    FROM terms
    """


@register("stats_g_test_dow_type", oracle=_gtest_oracle())
def stats_g_test_dow_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio chi-square) of independence between
    day-of-week and event type: G = 2 Σ O·ln(O·N/(R·C)) over the
    7×5-bounded contingency grid — the LR companion to the Pearson
    chi-square already in the family (stats_chi_square_lang_source);
    G is additive under partitioning and better-behaved at small
    expected counts, so it is the one mutual-information decomposes
    into (G = 2N·MI in nats).

    Every log argument is an exact integer (O·N and R·C, ≤ ~10¹⁵ at
    sf1×10 — inside 2⁵³), ln via the det_ln_q twins, the G sum a pure
    int64 accumulation with ONE final /10⁶ display division. Zero
    cells contribute nothing by construction (grid rows only exist
    for observed cells). The fact scan partial-aggregates to ≤ 35
    cells before margins join — three broadcast-size equi-joins on a
    bounded grid, no data-scaled shuffle beyond the first aggregate.
    """
    from ..functions.detmath import det_ln_q

    t = Tables(spark, sf_dir)
    cells = t.events.groupBy(
        F.dayofweek(F.to_date("ts")).cast("long").alias("dow"), "event_type"
    ).agg(F.count(F.lit(1)).alias("o"))
    r = cells.groupBy("dow").agg(F.sum("o").alias("r"))
    c = cells.groupBy("event_type").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    m = (
        cells.join(F.broadcast(r), "dow")
        .join(F.broadcast(c), "event_type")
        .crossJoin(F.broadcast(n))
    )
    term = F.col("o") * (
        det_ln_q(F.col("o") * F.col("n")) - det_ln_q(F.col("r") * F.col("c"))
    )
    agg = m.agg(
        F.sum("o").alias("n"),
        F.countDistinct("dow").alias("nr"),
        F.countDistinct("event_type").alias("nc"),
        F.sum(term).alias("gsum"),
    )
    return agg.select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("df"),
        ((F.lit(2) * F.col("gsum")) / F.lit(1e6)).alias("g_stat"),
    )


# ---------------------------------------------------------------------------
# 10. Exponential-decay user value at a halflife ladder
# ---------------------------------------------------------------------------

DECAY_HALflIVES = (7, 14, 30)
DECAY_KCAP = 40


def _decay_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    hl = ", ".join(str(h) for h in DECAY_HALflIVES)
    kc = DECAY_KCAP
    return f"""
    WITH ev AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ), ref AS (SELECT max(d) AS ref_d FROM ev),
    hs AS (SELECT CAST(unnest([{hl}]) AS BIGINT) AS h),
    wts AS (
      SELECT e.event_type, h.h, e.v,
             (1::HUGEINT << ({kc} - least(datediff('day', e.d, r.ref_d) // h.h,
                                          {kc}))) AS w
      FROM ev e, ref r, hs h
    )
    SELECT event_type, h AS halflife_days,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(v) AS BIGINT) AS raw_cents,
           {sql_round_big_int_ratio(
               'CAST(sum(w * v) AS HUGEINT)', f'1::HUGEINT << {kc}')}
             AS decayed_cents,
           {sql_round_big_int_ratio(
               'CAST(sum(w * v) AS HUGEINT)',
               f'(1::HUGEINT << {kc}) * sum(v)')} AS retention_ratio
    FROM wts GROUP BY event_type, h
    """


@register("events_decayed_value_halflife", oracle=_decay_oracle())
def events_decayed_value_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed event value at a halflife ladder
    (7/14/30 days): weight = 2^(−⌊Δ/H⌋) with Δ = days before the
    corpus reference date (max event date) — the step-decay form
    whose weights are EXACT dyadic rationals, so the whole ladder is
    integer arithmetic: numerator Σ v·2^(K−k) with K = 40 and k
    capped at K (weights below 2^−40 clamp to the floor, identically
    on both engines), one shift per row, two round_big_int_ratio
    outputs (decayed cents and the retention ratio decayed/raw).
    Continuous e^(−λΔ) decay would be transcendental per row — the
    dyadic staircase keeps the engine-boundary contract while
    preserving the halflife semantics product analytics wants
    (recency-weighted LTV per event type; the decay twin of
    events_ewma_value, which smooths rather than ages).

    One partial-aggregated pass over events per (type, halflife); the
    3-element ladder and the 1-row reference date ride broadcasts.
    Σv·2^K ≤ 10¹⁷·2⁴⁰ ≈ 10²⁹ at sf1×10 — inside decimal(38)/HUGEINT.
    """
    from ..functions.exact import round_big_int_ratio

    kc = DECAY_KCAP
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    ref = ev.agg(F.max("d").alias("ref_d"))
    hs = F.explode(
        F.array(*[F.lit(h).cast("long") for h in DECAY_HALflIVES])
    ).alias("h")
    k = F.least(
        F.floor(F.datediff(F.col("ref_d"), F.col("d")) / F.col("h")).cast("long"),
        F.lit(kc),
    )
    wts = (
        ev.crossJoin(F.broadcast(ref))
        .select("event_type", "v", "d", "ref_d", hs)
        .select("event_type", "h", "v", k.alias("k"))
        # pyspark's F.shiftleft only takes a literal shift amount; the
        # SQL form accepts a column expression
        .select(
            "event_type",
            "h",
            "v",
            F.expr(f"shiftleft(cast(1 as bigint), cast({kc} - k as int))").alias(
                "w"
            ),
        )
    )
    den_dec = F.lit(2 ** kc).cast("decimal(38,0)")
    return wts.groupBy("event_type", F.col("h").alias("halflife_days")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").alias("raw_cents"),
        round_big_int_ratio(
            F.sum(_dec(F.col("w")) * _dec(F.col("v"))), den_dec
        ).alias("decayed_cents"),
        round_big_int_ratio(
            F.sum(_dec(F.col("w")) * _dec(F.col("v"))),
            den_dec * _dec(F.sum("v")),
        ).alias("retention_ratio"),
    )


# ---------------------------------------------------------------------------
# 11. Quasi-identifier entropy / re-identification risk audit
# ---------------------------------------------------------------------------


def _qi_entropy_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2
    ), {sql_det_ln_steps('cells', 'c', 'lc')},
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(c * lc) AS BIGINT) AS clc,
             CAST(max(c) AS BIGINT) AS max_c,
             CAST(min(c) AS BIGINT) AS min_c
      FROM lc_rel
    ), witharg AS (
      SELECT *, n AS arg_n, n_cells AS arg_m FROM tot
    ), {sql_det_ln_steps('witharg', 'arg_n', 'ln_n')},
    {sql_det_ln_steps('ln_n_rel', 'arg_m', 'ln_m')}
    SELECT n AS n_rows, n_cells, min_c AS min_cell_size,
           {sql_round_int_ratio('max_c', 'n')} AS max_cell_share,
           {_sql_halfup_div('(n * ln_n - clc)', 'n')} / 1000000.0
             AS entropy_nats,
           ln_m / 1000000.0 AS ln_cells
    FROM ln_m_rel
    """


@register("privacy_qi_entropy_risk", oracle=_qi_entropy_oracle())
def privacy_qi_entropy_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy-based re-identification risk of the customer
    quasi-identifier pair (nation, market segment): Shannon entropy
    H = ln N − (Σ c·ln c)/N of the QI-cell distribution, its ceiling
    ln(#cells), the smallest cell (the k-anonymity floor the
    k-map/k-anon audits threshold on) and the largest cell share (the
    prosecutor-model worst-case linkage probability's complement).
    The information-theoretic summary BESIDE the threshold audits:
    two releases can both pass k=5 yet differ hugely in how close
    their QI distribution sits to its uniform ceiling.

    Exactness: counts are integers, every ln is det_ln_q (args ≤ N <
    2⁵³ at any realistic scale), Σc·L(c) an int64 sum, entropy one
    shared half-up integer division quantized at micro-nats with a
    single /10⁶ display divide; the max share is an exact
    round_int_ratio. One partial-aggregated scan to the bounded QI
    grid (≤ 25·5 cells); everything downstream is scalar.
    """
    from ..functions.detmath import det_ln_q
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    cells = t.customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("c") * det_ln_q(F.col("c"))).alias("clc"),
        F.max("c").alias("max_c"),
        F.min("c").alias("min_c"),
    )
    return tot.select(
        F.col("n").alias("n_rows"),
        "n_cells",
        F.col("min_c").alias("min_cell_size"),
        round_int_ratio(F.col("max_c"), F.col("n")).alias("max_cell_share"),
        (
            _halfup_div(
                F.col("n") * det_ln_q(F.col("n")) - F.col("clc"), F.col("n")
            ).cast("long")
            / F.lit(1e6)
        ).alias("entropy_nats"),
        (det_ln_q(F.col("n_cells")) / F.lit(1e6)).alias("ln_cells"),
    )


# ---------------------------------------------------------------------------
# 12. Shewhart c-chart violations of the daily order-count series
# ---------------------------------------------------------------------------

CCHART_TOPK = 10


def _cchart_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio, sql_round_int_ratio

    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
      FROM daily
    ), scored AS (
      SELECT d.day, d.c, t.n, t.s,
             (t.n * d.c - t.s) * (t.n * d.c - t.s) AS dev2,
             CASE WHEN t.n * d.c > t.s THEN 1 ELSE -1 END AS side
      FROM daily d, tot t
    ), viol AS (
      SELECT * FROM scored WHERE dev2 > 9 * s * n
    ), nv AS (SELECT CAST(count(*) AS BIGINT) AS n_violations FROM viol)
    SELECT CAST(v.day AS TIMESTAMP) AS day, v.c AS day_count, v.side,
           nv.n_violations,
           {sql_round_int_ratio('v.s', 'v.n')} AS mean_daily,
           {sql_round_big_int_ratio('v.dev2', '9 * v.s * v.n')} AS z2_over_9
    FROM viol v, nv
    ORDER BY v.dev2 DESC, v.day
    LIMIT {CCHART_TOPK}
    """


@register("dq_control_chart_daily", oracle=_cchart_oracle())
def dq_control_chart_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart c-chart over the daily order-count series: flag days
    outside the Poisson 3-sigma control limits c_bar ± 3·√c_bar — the
    process-control member of the DQ family (the weekday-anomaly
    audit compares to same-weekday peers; this tests GLOBAL process
    stability with the classical count-chart limits).

    The sigma test is exact cross-multiplied integers — |c − S/N| >
    3√(S/N) squares to (Nc − S)² > 9SN, no square root anywhere; the
    reported z²/9 (how far past the limit) and the mean are single
    round_*_int_ratio quantities. Top-10 violations by squared
    deviation (day tie-break) via TakeOrderedAndProject; row counts
    match on both engines because the predicate is identical integer
    arithmetic. Fact scan partial-aggregates to the ~2.4k-day
    calendar table; everything after is bounded.
    """
    from ..functions.exact import round_big_int_ratio, round_int_ratio

    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
    dev = F.col("n") * F.col("c") - F.col("s")
    scored = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "c",
        "n",
        "s",
        (_dec(dev) * _dec(dev)).alias("dev2"),
        F.when(dev > 0, F.lit(1)).otherwise(F.lit(-1)).alias("side"),
    )
    viol = scored.filter(
        F.col("dev2") > F.lit(9).cast("decimal(38,0)") * _dec(F.col("s")) * _dec(F.col("n"))
    )
    nv = viol.agg(F.count(F.lit(1)).alias("n_violations"))
    return (
        viol.crossJoin(F.broadcast(nv))
        .orderBy(F.col("dev2").desc(), F.col("day").asc())
        .limit(CCHART_TOPK)
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.col("c").alias("day_count"),
            "side",
            "n_violations",
            round_int_ratio(F.col("s"), F.col("n")).alias("mean_daily"),
            round_big_int_ratio(
                F.col("dev2"),
                F.lit(9).cast("decimal(38,0)") * _dec(F.col("s")) * _dec(F.col("n")),
            ).alias("z2_over_9"),
        )
    )


# ---------------------------------------------------------------------------
# 13. Rayleigh test of hour-of-day uniformity per event type
# ---------------------------------------------------------------------------

# cos/sin(2*pi*h/24) quantized at 1e-6 — the SAME 48 integer literals are
# embedded in the Spark plan and the SQL twin, so the trig never crosses
# the engine boundary as a float computation
RAYLEIGH_COSQ = [1000000, 965926, 866025, 707107, 500000, 258819, 0, -258819, -500000, -707107, -866025, -965926, -1000000, -965926, -866025, -707107, -500000, -258819, 0, 258819, 500000, 707107, 866025, 965926]
RAYLEIGH_SINQ = [0, 258819, 500000, 707107, 866025, 965926, 1000000, 965926, 866025, 707107, 500000, 258819, 0, -258819, -500000, -707107, -866025, -965926, -1000000, -965926, -866025, -707107, -500000, -258819]


def _rayleigh_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    cosl = ", ".join(str(v) for v in RAYLEIGH_COSQ)
    sinl = ", ".join(str(v) for v in RAYLEIGH_SINQ)
    return f"""
    WITH hrs AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), vecs AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * ([{cosl}])[h + 1]) AS BIGINT) AS sc,
             CAST(sum(c * ([{sinl}])[h + 1]) AS BIGINT) AS ss
      FROM hrs GROUP BY event_type
    )
    SELECT event_type, n,
           {sql_round_big_int_ratio(
               'sc::HUGEINT * sc + ss::HUGEINT * ss',
               'n::HUGEINT * 1000000000000')} AS rayleigh_z,
           {sql_round_big_int_ratio(
               'sc::HUGEINT * sc + ss::HUGEINT * ss',
               'n::HUGEINT * n * 1000000000000')} AS rbar_sq
    FROM vecs
    """


@register("stats_rayleigh_hour_uniformity", oracle=_rayleigh_oracle())
def stats_rayleigh_hour_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh test of circular uniformity on the hour-of-day
    distribution, per event type: z = n·R_bar² where R_bar is the mean
    resultant length of the unit vectors at angles 2πh/24 — the
    CIRCULAR-statistics member the family lacked (the hourly-entropy
    profile measures concentration but ignores adjacency: 9 a.m. and
    10 a.m. are as different to it as 9 a.m. and 9 p.m.; the Rayleigh
    resultant knows the hours wrap).

    The 24 cos/sin values are 1e-6-quantized integer LITERALS baked
    identically into the Spark plan and the SQL twin (module
    constants), so no engine evaluates a single trig function: the
    resultant components are int64 dot products over the ≤ 24-row
    per-type hour histogram and z = (Sc² + Ss²)/(n·10¹²) is one exact
    round_big_int_ratio (Sc² ≤ ~10²⁵ at sf1×10 — decimal/HUGEINT).
    Quantizing the direction vectors (not the statistic) shifts z by
    < 10⁻⁶·n relative — identical on both engines, irrelevant to the
    uniformity verdict. One partial-aggregated scan to the bounded
    (type × hour) grid; everything after is a ≤ 5-row aggregate.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    hrs = t.events.groupBy(
        "event_type", F.hour("ts").cast("long").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    cos_arr = F.array(*[F.lit(v).cast("long") for v in RAYLEIGH_COSQ])
    sin_arr = F.array(*[F.lit(v).cast("long") for v in RAYLEIGH_SINQ])
    vecs = hrs.select(
        "event_type",
        "c",
        (F.col("c") * F.element_at(cos_arr, (F.col("h") + 1).cast("int"))).alias(
            "cc"
        ),
        (F.col("c") * F.element_at(sin_arr, (F.col("h") + 1).cast("int"))).alias(
            "cs"
        ),
    ).groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum("cc").alias("sc"),
        F.sum("cs").alias("ss"),
    )
    num = _dec(F.col("sc")) * _dec(F.col("sc")) + _dec(F.col("ss")) * _dec(
        F.col("ss")
    )
    scale = F.lit(10**12).cast("decimal(38,0)")
    return vecs.select(
        "event_type",
        "n",
        round_big_int_ratio(num, _dec(F.col("n")) * scale).alias("rayleigh_z"),
        round_big_int_ratio(
            num, _dec(F.col("n")) * _dec(F.col("n")) * scale
        ).alias("rbar_sq"),
    )


# ---------------------------------------------------------------------------
# 14. Interrupted-time-series segmented regression on daily activity
# ---------------------------------------------------------------------------


def _its_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), idx AS (
      SELECT a.day, a.y, CAST(count(*) AS HUGEINT) AS k
      FROM daily a JOIN daily b ON b.day <= a.day
      GROUP BY a.day, a.y
    ), brk AS (SELECT CAST(count(*) AS HUGEINT) // 2 AS kb FROM idx),
    s1 AS ({_ols_sums_sql('idx, brk', 'WHERE k <= kb', '1')}),
    s2 AS ({_ols_sums_sql('idx, brk', 'WHERE k > kb', '2')}),
    co AS (
      SELECT kb, n1, n2,
             n1 * stt1 - st1 * st1 AS d1, sy1 * stt1 - st1 * sty1 AS a1,
             n1 * sty1 - st1 * sy1 AS b1,
             n2 * stt2 - st2 * st2 AS d2, sy2 * stt2 - st2 * sty2 AS a2,
             n2 * sty2 - st2 * sy2 AS b2
      FROM s1, s2, brk
    )
    SELECT CAST(n1 AS BIGINT) AS n_pre, CAST(n2 AS BIGINT) AS n_post,
           {sql_round_big_int_ratio('b1', 'd1')} AS slope_pre,
           {sql_round_big_int_ratio('b2', 'd2')} AS slope_post,
           {sql_round_big_int_ratio('b2 * d1 - b1 * d2', 'd1 * d2')}
             AS slope_change,
           {sql_round_big_int_ratio(
               '(a2 + b2 * (kb + 1)) * d1 - (a1 + b1 * (kb + 1)) * d2',
               'd1 * d2')} AS level_change
    FROM co WHERE d1 > 0 AND d2 > 0
    """


@register("events_its_segmented_regression", oracle=_its_oracle())
def events_its_segmented_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted-time-series segmented regression on the daily
    event-count series, break at the series midpoint: independent OLS
    trends on the two halves, reporting the pre/post slopes, the
    slope change, and the LEVEL change — the post-model value at the
    first post-break day minus the pre-model counterfactual projected
    to that same day. The quasi-experimental EFFECT-SIZE companion to
    stats_chow_test_break (which only tests whether a break improves
    fit): ITS answers "by how much did the level jump and the trend
    bend".

    All coefficients are closed-form integer OLS over the rank from
    the house broadcast non-equi self-join (calendar-bounded series);
    slopes are B/D exact integer ratios, the cross-segment
    differences clear denominators ((B₂D₁ − B₁D₂)/(D₁D₂)), each
    output one round_big_int_ratio. D₁D₂ ≤ ~10¹⁰ and cross products
    ≤ ~10²⁶ at sf1×10 — decimal(38)/HUGEINT headroom. Degenerate
    halves (D = 0) empty the output identically on both engines.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    b0 = daily.select(F.col("day").alias("day_b"))
    idx = (
        daily.join(F.broadcast(b0), F.col("day_b") <= F.col("day"))
        .groupBy("day", "y")
        .agg(_dec(F.count(F.lit(1))).alias("k"))
    )
    nn = idx.agg(_dec(F.count(F.lit(1))).alias("n_tot"))
    brk = nn.select(
        _dec((F.col("n_tot") - F.col("n_tot") % 2) / 2).alias("kb")
    )

    def sums(pred, sfx):
        flt = F.when(pred, F.lit(1)).otherwise(F.lit(0)).cast("decimal(38,0)")
        return [
            F.sum(flt).alias(f"n{sfx}"),
            F.sum(flt * F.col("k")).alias(f"st{sfx}"),
            F.sum(flt * F.col("k") * F.col("k")).alias(f"stt{sfx}"),
            F.sum(flt * _dec(F.col("y"))).alias(f"sy{sfx}"),
            F.sum(flt * F.col("k") * _dec(F.col("y"))).alias(f"sty{sfx}"),
        ]

    stats = idx.crossJoin(F.broadcast(brk)).agg(
        F.max("kb").alias("kb"),
        *sums(F.col("k") <= F.col("kb"), "1"),
        *sums(F.col("k") > F.col("kb"), "2"),
    )

    def co(sfx):
        n, st, stt, sy, sty = (
            F.col(f"n{sfx}"),
            F.col(f"st{sfx}"),
            F.col(f"stt{sfx}"),
            F.col(f"sy{sfx}"),
            F.col(f"sty{sfx}"),
        )
        return [
            (n * stt - st * st).alias(f"d{sfx}"),
            (sy * stt - st * sty).alias(f"a{sfx}"),
            (n * sty - st * sy).alias(f"b{sfx}"),
        ]

    cos = stats.select("kb", "n1", "n2", *co("1"), *co("2")).filter(
        (F.col("d1") > 0) & (F.col("d2") > 0)
    )
    kb1 = F.col("kb") + F.lit(1).cast("decimal(38,0)")
    return cos.select(
        F.col("n1").cast("long").alias("n_pre"),
        F.col("n2").cast("long").alias("n_post"),
        round_big_int_ratio(F.col("b1"), F.col("d1")).alias("slope_pre"),
        round_big_int_ratio(F.col("b2"), F.col("d2")).alias("slope_post"),
        round_big_int_ratio(
            F.col("b2") * F.col("d1") - F.col("b1") * F.col("d2"),
            F.col("d1") * F.col("d2"),
        ).alias("slope_change"),
        round_big_int_ratio(
            (F.col("a2") + F.col("b2") * kb1) * F.col("d1")
            - (F.col("a1") + F.col("b1") * kb1) * F.col("d2"),
            F.col("d1") * F.col("d2"),
        ).alias("level_change"),
    )


# ===========================================================================
# Batch 7 (round-10 final window fill)
# ===========================================================================


# ---------------------------------------------------------------------------
# 15. IVF recall-vs-nprobe tuning curve
# ---------------------------------------------------------------------------

IVFC_CENTROIDS = 8
IVFC_QUERIES = 16
IVFC_TOPK = 10
IVFC_PROBES = (1, 2, 4, 8)


def _ivf_curve_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    probes = ", ".join(str(p) for p in IVFC_PROBES)
    return f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cent AS (
      SELECT vec_id AS centroid_id, v AS cv FROM emb
      WHERE vec_id < {IVFC_CENTROIDS}
    ), assigned AS (
      SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY round(list_cosine_similarity(v, cv), 9)
                                           DESC, centroid_id) AS rn
      FROM emb, cent
    ), cells AS (
      SELECT vec_id, centroid_id AS cell FROM assigned WHERE rn = 1
    ), queries AS (
      SELECT vec_id AS query_id, v AS qv FROM emb
      WHERE vec_id < {IVFC_QUERIES}
    ), proberank AS (
      SELECT q.query_id, c.centroid_id AS cell,
             CAST(row_number() OVER (PARTITION BY q.query_id
                                     ORDER BY round(list_cosine_similarity(q.qv, c.cv), 9)
                                                DESC, c.centroid_id) AS BIGINT) AS rp
      FROM queries q, cent c
    ), truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY round(list_cosine_similarity(q.qv, e.v), 6)
                                             DESC, e.vec_id) AS rnk
        FROM queries q JOIN emb e ON e.vec_id <> q.query_id
      ) WHERE rnk <= {IVFC_TOPK}
    ), hit_r AS (
      SELECT t.query_id, pr.rp
      FROM truth t
      JOIN cells cl ON cl.vec_id = t.neighbor_id
      JOIN proberank pr ON pr.query_id = t.query_id AND pr.cell = cl.cell
    ), by_r AS (
      SELECT rp, CAST(count(*) AS BIGINT) AS cnt FROM hit_r GROUP BY rp
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_true,
             CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries
      FROM truth
    ), ps AS (SELECT CAST(unnest([{probes}]) AS BIGINT) AS nprobe)
    SELECT p.nprobe, t.n_queries, t.n_true,
           CAST(coalesce(sum(b.cnt), 0) AS BIGINT) AS n_found,
           {sql_round_int_ratio('coalesce(sum(b.cnt), 0)', 't.n_true')}
             AS recall
    FROM ps p
    LEFT JOIN by_r b ON b.rp <= p.nprobe
    CROSS JOIN tot t
    GROUP BY p.nprobe, t.n_queries, t.n_true
    """


@register("similarity_ivf_nprobe_recall_curve", oracle=_ivf_curve_oracle())
def similarity_ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF index as a function of nprobe (1/2/4/8
    probed cells out of 8) — the IVF twin of the LSH banding tuning
    curve (dedup_lsh_band_tuning_curve): the capacity-planning table
    that prices "how many cells must a query touch for the recall the
    product needs". ann_ivf_topk ships ONE operating point; this
    measures the whole trade.

    Mechanism: every truth neighbor (exact brute-force top-10 for 16
    fixed query vectors) is labeled with the probe rank of ITS cell
    in the query's centroid ordering; recall at nprobe = share of
    truth rows with rank ≤ nprobe, a cumulative over the ≤ 8-row
    rank histogram against the broadcast 4-row probe grid — the
    curve costs ONE brute-force pass, not one per operating point.
    Cell argmax and rankings reuse ann_ivf_topk's determinism recipe
    (cosines rounded at 9/6 decimals with id tie-breaks, identical
    in the SQL twin); recall is an exact round_int_ratio.

    Scale shape: the only corpus-scaled stage is the 16-query
    brute-force join (the knn_brute_cosine shape, broadcast queries,
    no cartesian) and the one-broadcast-join cell assignment;
    everything downstream is bounded (160 truth rows, 128 probe
    ranks, 8+4-row grids).
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    emb = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", norm)
    centroids = emb.filter(F.col("vec_id") < IVFC_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = emb.join(F.broadcast(centroids)).select(
        "vec_id",
        "centroid_id",
        F.round(dot("v", "cv") / (F.col("nrm") * F.col("cn")), 9).alias("sim"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    cells = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").alias("cell"))
    )
    queries = emb.filter(F.col("vec_id") < IVFC_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    proberank = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            F.col("centroid_id").alias("cell"),
            F.round(dot("qv", "cv") / (F.col("qn") * F.col("cn")), 9).alias(
                "sim"
            ),
        )
        .withColumn(
            "rp",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("cell")
                )
            )
            .cast("long"),
        )
        .select("query_id", "cell", "rp")
    )
    pairs = emb.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(dot("v", "qv") / (F.col("nrm") * F.col("qn")), 6).alias(
            "cosine"
        ),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    truth = (
        pairs.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= IVFC_TOPK)
        .select("query_id", "neighbor_id")
    )
    hit_r = truth.join(
        cells.select(F.col("vec_id").alias("neighbor_id"), "cell"),
        "neighbor_id",
    ).join(F.broadcast(proberank), ["query_id", "cell"])
    by_r = hit_r.groupBy("rp").agg(F.count(F.lit(1)).alias("cnt"))
    tot = truth.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.countDistinct("query_id").alias("n_queries"),
    )
    ps = F.explode(
        F.array(*[F.lit(p).cast("long") for p in IVFC_PROBES])
    ).alias("nprobe")
    grid = tot.select(ps, "n_queries", "n_true")
    return (
        grid.join(F.broadcast(by_r), F.col("rp") <= F.col("nprobe"), "left")
        .groupBy("nprobe", "n_queries", "n_true")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_found"))
        .select(
            "nprobe",
            "n_queries",
            "n_true",
            "n_found",
            round_int_ratio(F.col("n_found"), F.col("n_true")).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# 16. Spiegelhalter calibration Z test per language
# ---------------------------------------------------------------------------


def _spiegelhalter_oracle() -> str:
    from .ml import _scored_labeled_sql
    from ..functions.exact import sql_round_big_int_ratio

    return (
        _scored_labeled_sql()
        + f"""
    , terms AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum((10000 * label - score_q)::HUGEINT
                      * (10000 - 2 * score_q)) AS HUGEINT) AS num_s,
             CAST(sum((10000 - 2 * score_q)::HUGEINT * (10000 - 2 * score_q)
                      * score_q * (10000 - score_q)) AS HUGEINT) AS var_s
      FROM scored GROUP BY lang
    )
    SELECT lang, n,
           CASE WHEN var_s > 0 THEN
             {sql_round_big_int_ratio(
                 '(CASE WHEN num_s < 0 THEN -1 ELSE 1 END) * num_s * num_s',
                 '10000::HUGEINT * var_s')}
           END AS z_signed_sq
    FROM terms
    """
    )


@register("ml_spiegelhalter_z_calibration", oracle=_spiegelhalter_oracle())
def ml_spiegelhalter_z_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter's calibration Z test of the hashed classifier
    against the rule gate, per language: Z = Σ(y−p)(1−2p) /
    √(Σ(1−2p)²p(1−p)) — the SIGNIFICANCE member of the calibration
    family (ECE/MCE measure the size of miscalibration, the Brier
    decomposition attributes it; Spiegelhalter tests whether it
    exceeds chance given n). Reported as the signed squared statistic
    sign(Z)·Z², the house exact form for √-normalized tests (the CCF
    op's convention): with p = score_q/10⁴ every sum is an exact
    integer after clearing 10⁴ powers — numerator·10⁸ =
    Σ(10⁴y−q)(10⁴−2q), variance·10¹⁶ = Σ(10⁴−2q)²q(10⁴−q) — and
    sign(Z)·Z² = sign·num²/(10⁴·var) is one round_big_int_ratio
    (num² ≤ ~10²⁹ at sf1×10, inside decimal(38)/HUGEINT).

    One partial-aggregated scan of the scored corpus to ≤ 5 language
    rows; perfectly-confident degenerate groups (var = 0) yield NULL
    identically on both engines.
    """
    from .ml import _scored_labeled
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    s = _scored_labeled(t)
    q = F.col("score_q")
    one_2q = F.lit(10000) - 2 * q
    terms = s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec((F.lit(10000) * F.col("label") - q)) * _dec(one_2q)).alias(
            "num_s"
        ),
        F.sum(
            _dec(one_2q) * _dec(one_2q) * _dec(q) * _dec(F.lit(10000) - q)
        ).alias("var_s"),
    )
    sign = F.when(F.col("num_s") < 0, F.lit(-1)).otherwise(F.lit(1)).cast(
        "decimal(38,0)"
    )
    return terms.select(
        "lang",
        "n",
        F.when(
            F.col("var_s") > 0,
            round_big_int_ratio(
                sign * F.col("num_s") * F.col("num_s"),
                F.lit(10000).cast("decimal(38,0)") * F.col("var_s"),
            ),
        ).alias("z_signed_sq"),
    )


# ---------------------------------------------------------------------------
# 17. Duplicate-cap retention curve
# ---------------------------------------------------------------------------

DUPCAP_CAPS = (1, 2, 4, 8)


def _dupcap_oracle() -> str:
    from .corpus import _SQL_TOKENS
    from ..functions.exact import sql_round_int_ratio

    caps = ", ".join(str(c) for c in DUPCAP_CAPS)
    return f"""
    WITH keyed AS (
      SELECT sha256(text) AS kk, CAST(len({_SQL_TOKENS}) AS BIGINT) AS tok
      FROM documents
    ), clusters AS (
      SELECT kk, CAST(count(*) AS BIGINT) AS c,
             CAST(max(tok) AS BIGINT) AS tok_one
      FROM keyed GROUP BY kk
    ), caps AS (SELECT CAST(unnest([{caps}]) AS BIGINT) AS cap),
    grid AS (
      SELECT cap, c, tok_one, least(c, cap) AS kept
      FROM clusters, caps
    )
    SELECT cap,
           CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS docs_kept,
           CAST(sum(c * tok_one) AS BIGINT) AS tokens_total,
           CAST(sum(kept * tok_one) AS BIGINT) AS tokens_kept,
           {sql_round_int_ratio('sum(kept)', 'sum(c)')} AS doc_retention,
           {sql_round_int_ratio('sum(kept * tok_one)', 'sum(c * tok_one)')}
             AS token_retention
    FROM grid GROUP BY cap
    """


@register("corpus_dup_cap_retention_curve", oracle=_dupcap_oracle())
def corpus_dup_cap_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention curve of the cap-duplicates-at-m policy (m = 1/2/4/8
    copies kept per exact-duplicate cluster): per cap, documents and
    tokens surviving — the dedup twin of the truncation-loss curve,
    pricing the standard "keep a few copies" family
    of LLM-corpus dedup policies (keep-one is m=1; unbounded is the
    raw corpus) before committing to one. Cluster key is sha256 of the
    raw text (the dedup_exact_text identity); every copy in a cluster
    has the same token count by construction, so token retention is
    min(c,m)·t per cluster — all integer arithmetic with exact
    round_int_ratio shares.

    One partial-aggregated scan to the cluster table (hash-keyed
    groupBy, no global sort), then a 4-element cap ladder over the
    cluster-size domain.
    """
    from ..functions.exact import round_int_ratio
    from ..functions.textnorm import whitespace_tokens

    t = Tables(spark, sf_dir)
    keyed = t.documents.select(
        F.sha2(F.col("text"), 256).alias("kk"),
        F.size(whitespace_tokens(F.col("text"))).cast("long").alias("tok"),
    )
    clusters = keyed.groupBy("kk").agg(
        F.count(F.lit(1)).alias("c"), F.max("tok").alias("tok_one")
    )
    caps = F.explode(
        F.array(*[F.lit(c).cast("long") for c in DUPCAP_CAPS])
    ).alias("cap")
    grid = clusters.select("c", "tok_one", caps).select(
        "cap", "c", "tok_one", F.least(F.col("c"), F.col("cap")).alias("kept")
    )
    return grid.groupBy("cap").agg(
        F.sum("c").alias("n_docs"),
        F.sum("kept").alias("docs_kept"),
        F.sum(F.col("c") * F.col("tok_one")).alias("tokens_total"),
        F.sum(F.col("kept") * F.col("tok_one")).alias("tokens_kept"),
        round_int_ratio(F.sum("kept"), F.sum("c")).alias("doc_retention"),
        round_int_ratio(
            F.sum(F.col("kept") * F.col("tok_one")),
            F.sum(F.col("c") * F.col("tok_one")),
        ).alias("token_retention"),
    )


# ---------------------------------------------------------------------------
# 18. Audience-overlap Jaccard between event-type pairs
# ---------------------------------------------------------------------------


def _audience_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), sizes AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM ut a JOIN ut b
        ON b.user_id = a.user_id AND b.event_type > a.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, sa.n AS users_a, sb.n AS users_b,
           i.n_inter, sa.n + sb.n - i.n_inter AS n_union,
           {sql_round_int_ratio('i.n_inter', 'sa.n + sb.n - i.n_inter')}
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """


@register("events_type_audience_jaccard", oracle=_audience_oracle())
def events_type_audience_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap Jaccard between every pair of event types:
    |users doing both| / |users doing either| — the product-analytics
    segmentation primitive ("are purchasers a subset of clickers, or
    a different crowd?") that the funnel/attribution queries assume
    but never measure. Pairs with zero shared users drop out (no row),
    identically on both engines.

    Scale shape: the fact scan first collapses to DISTINCT (user,
    type) — a hash aggregate bounded by users × 5 — then the
    intersection is a user-keyed equi self-join whose per-user fan-out
    is ≤ C(5,2) = 10 rows BY MECHANISM (type-pair grid, never
    user-pair); sizes join back on the ≤ 5-row type table. Jaccard is
    one exact round_int_ratio.
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    ut = t.events.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("uid_b"), F.col("event_type").alias("type_b"))
    inter = (
        a.join(
            b,
            (F.col("uid_b") == F.col("user_id"))
            & (F.col("type_b") > F.col("type_a")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("users_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("users_b"))
    j = inter.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
    uni = F.col("users_a") + F.col("users_b") - F.col("n_inter")
    return j.select(
        "type_a",
        "type_b",
        "users_a",
        "users_b",
        "n_inter",
        uni.alias("n_union"),
        round_int_ratio(F.col("n_inter"), uni).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# 19. Entropy rate of the user-path Markov chain
# ---------------------------------------------------------------------------


def _markov_entropy_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps

    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ), rowsum AS (
      SELECT from_type, CAST(sum(c) AS BIGINT) AS cf FROM trans GROUP BY 1
    ), cells AS (
      SELECT t.from_type, t.to_type, t.c, r.cf
      FROM trans t JOIN rowsum r USING (from_type)
    ), {sql_det_ln_steps('cells', 'c', 'lc')},
    withcf AS (SELECT *, cf AS arg_cf FROM lc_rel),
    {sql_det_ln_steps('withcf', 'arg_cf', 'lcf')},
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_transitions,
             CAST(count(DISTINCT from_type) AS BIGINT) AS n_states,
             CAST(count(*) AS BIGINT) AS n_edges,
             CAST(sum(c * (lcf - lc)) AS BIGINT) AS hsum
      FROM lcf_rel
    ), witha AS (SELECT *, n_states AS arg_m FROM agg),
    {sql_det_ln_steps('witha', 'arg_m', 'lnm')}
    SELECT n_transitions, n_states, n_edges,
           {_sql_halfup_div('hsum', 'n_transitions')} / 1000000.0
             AS entropy_rate_nats,
           lnm / 1000000.0 AS ln_states
    FROM lnm_rel
    """


@register("events_markov_entropy_rate", oracle=_markov_entropy_oracle())
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the user-path Markov chain:
    H = −Σ_ij p̂(i,j)·ln p̂(j|i) = Σ_ij (c_ij/C)·(ln c_i• − ln c_ij)
    over the consecutive-event transition counts — the
    predictability summary of the whole path model the family
    already materializes (events_user_path_transitions is the kernel,
    events_markov_stationary its long-run mix; the entropy rate says
    in one number how deterministic user behavior is, with ln(#states)
    as the ceiling).

    Pairing is the house (ts, event_id)-ordered lag window per user —
    one user-keyed exchange, then everything lives on the ≤ 5×5
    transition grid: every ln is det_ln_q on an exact integer count
    (< 2⁵³ at any scale), the H sum an int64 accumulation, the rate
    one shared half-up division quantized at micro-nats.
    """
    from ..functions.detmath import det_ln_q

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rowsum = trans.groupBy("from_type").agg(F.sum("c").alias("cf"))
    cells = trans.join(F.broadcast(rowsum), "from_type")
    agg = cells.agg(
        F.sum("c").alias("n_transitions"),
        F.countDistinct("from_type").alias("n_states"),
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(
            F.col("c") * (det_ln_q(F.col("cf")) - det_ln_q(F.col("c")))
        ).alias("hsum"),
    )
    return agg.select(
        "n_transitions",
        "n_states",
        "n_edges",
        (
            _halfup_div(F.col("hsum"), F.col("n_transitions")).cast("long")
            / F.lit(1e6)
        ).alias("entropy_rate_nats"),
        (det_ln_q(F.col("n_states")) / F.lit(1e6)).alias("ln_states"),
    )
