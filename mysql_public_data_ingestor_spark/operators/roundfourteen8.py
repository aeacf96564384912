"""Round-14 direct registrations, batch AC (partial-AUC / EER / cost
curves off the shared ROC grid, attribute-disclosure and
re-identification risk, and the covariance participation ratio).

Six window-slot completions, each oracle-paired, replica-pinned and
plan-barred in ``tests/test_roundfourteen8.py`` (same-commit gate
rule; the THREE new single-partition allowlist entries —
``ml_partial_auc_mcclish``, ``ml_equal_error_rate``,
``ml_cost_curve_envelope``, all the fbeta/Youden descending
score-grid cumulative class — land in ``tests/test_plans.py`` in the
same commit). Every name was checked against the full 599-name
registry inventory before design (the SCALE §5j.7 authoring rule):

* ``ml_partial_auc_mcclish`` — partial AUC on FPR <= 0.1 with the
  McClish (1989) standardization.
* ``ml_equal_error_rate`` — the FPR = FNR operating point with exact
  bracketing and linear interpolation.
* ``ml_cost_curve_envelope`` — the Drummond-Holte (2006) lower cost
  envelope over a probability-cost grid.
* ``privacy_beta_likeness_audit`` — beta-likeness attribute
  disclosure over the shared QI grouping (Cao & Karras 2012).
* ``privacy_reid_risk_prosecutor`` — prosecutor re-identification
  risk profile (average / maximum / share above 1/k).
* ``embedding_participation_ratio`` — covariance spectrum
  participation ratio (tr S)^2 / ||S||_F^2, fully exact integers.

Reference parity note: the reference (Go ingestion pipeline,
``/root/reference/main.go``) has no analytics; these extend SURVEY
§2.C ML / privacy / embedding compression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables
from .roundeleven import _dec, _halfup_div, _sql_halfup_div

# ---------------------------------------------------------------------------
# shared: the (v desc, n_sel, tp) ROC cumulative with totals
# ---------------------------------------------------------------------------


def _sql_roc_cum() -> str:
    """grid/tot/cum CTEs — the ml_recall_at_precision_floor ROC
    cumulative (re-stated per-op by that family's convention)."""
    return """
    grid AS (
      SELECT score_q, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(label) AS BIGINT) AS pos
      FROM scored GROUP BY score_q
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(pos) AS BIGINT) AS p
      FROM grid
    ), cum AS (
      SELECT score_q AS v,
             sum(n) OVER (ORDER BY score_q DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_sel,
             sum(pos) OVER (ORDER BY score_q DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
      FROM grid
    )
"""


def _roc_cum(t: Tables):
    from pyspark.sql.window import Window

    from .ml import _scored_labeled

    grid = _scored_labeled(t).groupBy("score_q").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos")
    )
    tot = grid.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("pos").cast("long").alias("p")
    )
    w = Window.orderBy(F.col("score_q").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        F.col("score_q").alias("v"),
        F.sum("n").over(w).cast("long").alias("n_sel"),
        F.sum("pos").over(w).cast("long").alias("tp"),
    )
    return cum, tot


# ---------------------------------------------------------------------------
# 1. Partial AUC (FPR <= 1/10) with McClish standardization
# ---------------------------------------------------------------------------

PAUC_B_NUM, PAUC_B_DEN = 1, 10  # FPR band [0, 0.1]


def _pauc_oracle() -> str:
    from .ml import _scored_labeled_sql

    b = f"({PAUC_B_NUM}.0::DOUBLE / {PAUC_B_DEN}.0::DOUBLE)"
    return (
        _scored_labeled_sql()
        + ", "
        + _sql_roc_cum().strip()
        + f"""
    , pts AS (
      SELECT v,
             CAST(n_sel - tp AS DOUBLE) / CAST((SELECT nn - p FROM tot) AS DOUBLE)
               AS x,
             CAST(tp AS DOUBLE) / CAST((SELECT p FROM tot) AS DOUBLE) AS y
      FROM cum
    ), segs AS (
      SELECT coalesce(lag(x) OVER (ORDER BY v DESC), 0.0::DOUBLE) AS x1,
             coalesce(lag(y) OVER (ORDER BY v DESC), 0.0::DOUBLE) AS y1,
             x AS x2, y AS y2
      FROM pts
    ), contrib AS (
      SELECT CASE
        WHEN x2 <= {b} THEN (x2 - x1) * (y1 + y2) * 0.5::DOUBLE
        WHEN x1 < {b} THEN
          ({b} - x1)
          * (y1 + (y1 + (y2 - y1) * (({b} - x1) / (x2 - x1)))) * 0.5::DOUBLE
        ELSE 0.0::DOUBLE END AS a
      FROM segs WHERE x2 > x1
    ), area AS (
      SELECT sum(CAST(floor(a * 1000000000000.0::DOUBLE + 0.5) AS BIGINT)) AS a_pico
      FROM contrib
    )
    SELECT CAST((SELECT nn FROM tot) AS BIGINT) AS n_docs,
           CAST((SELECT p FROM tot) AS BIGINT) AS n_pos,
           CAST(a_pico AS BIGINT) AS pauc_pico,
           CAST(floor(
             (0.5::DOUBLE * (1.0::DOUBLE
               + ((CAST(a_pico AS DOUBLE) / 1000000000000.0::DOUBLE
                   - {b} * {b} * 0.5::DOUBLE)
                  / ({b} - {b} * {b} * 0.5::DOUBLE))))
             * 1000000.0::DOUBLE + 0.5) AS BIGINT) AS pauc_mcclish_micro
    FROM area
    """
    )


@register("ml_partial_auc_mcclish", oracle=_pauc_oracle())
def ml_partial_auc_mcclish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial AUC restricted to the deployable low-false-positive
    band FPR in [0, 0.1], with the McClish (1989) standardization
    0.5 (1 + (A - A_min)/(A_max - A_min)) so the number reads like a
    full AUC (0.5 = chance, 1 = perfect IN THE BAND). Global AUC
    (``ml_auc_by_lang``) credits ranking skill at operating points a
    production filter will never use; when the alert budget caps FPR
    at 10%, THIS is the discrimination that matters, and two models
    with equal AUC routinely swap order under it.

    Exactness: the ROC polyline vertices are exact integer rationals
    off the shared descending score-grid cumulative; each trapezoid
    (and the single interpolated boundary segment) evaluates as a
    mirrored IEEE double expression and quantizes to pico-area units
    BEFORE the order-independent integer sum; the standardization is
    one further mirrored expression, quantized at micro.

    Scale shape: one scored scan to the <= 10001-value grid; the
    cumulative and its lag are the fbeta/Youden allowlist class
    (entry landed in this same commit). 1 row out.
    """
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    cum, tot = _roc_cum(t)
    b = float(PAUC_B_NUM) / float(PAUC_B_DEN)
    pts = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        ((F.col("n_sel") - F.col("tp")).cast("double")
         / (F.col("nn") - F.col("p")).cast("double")).alias("x"),
        (F.col("tp").cast("double") / F.col("p").cast("double")).alias("y"),
    )
    wlag = Window.orderBy(F.col("v").desc())
    segs = pts.select(
        F.coalesce(F.lag("x").over(wlag), F.lit(0.0)).alias("x1"),
        F.coalesce(F.lag("y").over(wlag), F.lit(0.0)).alias("y1"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    ).where(F.col("x2") > F.col("x1"))
    bl = F.lit(b)
    yb = F.col("y1") + (F.col("y2") - F.col("y1")) * (
        (bl - F.col("x1")) / (F.col("x2") - F.col("x1"))
    )
    a = (
        F.when(
            F.col("x2") <= bl,
            (F.col("x2") - F.col("x1")) * (F.col("y1") + F.col("y2")) * F.lit(0.5),
        )
        .when(
            F.col("x1") < bl,
            (bl - F.col("x1")) * (F.col("y1") + yb) * F.lit(0.5),
        )
        .otherwise(F.lit(0.0))
    )
    area = segs.agg(
        F.sum(F.floor(a * F.lit(1e12) + F.lit(0.5)).cast("long")).alias("a_pico")
    )
    std = F.lit(0.5) * (
        F.lit(1.0)
        + (
            (F.col("a_pico").cast("double") / F.lit(1e12) - F.lit(b * b * 0.5))
            / (F.lit(b) - F.lit(b * b * 0.5))
        )
    )
    return area.crossJoin(F.broadcast(tot)).select(
        F.col("nn").alias("n_docs"),
        F.col("p").alias("n_pos"),
        F.col("a_pico").alias("pauc_pico"),
        F.floor(std * F.lit(1e6) + F.lit(0.5)).cast("long").alias(
            "pauc_mcclish_micro"
        ),
    )


# ---------------------------------------------------------------------------
# 2. Equal error rate with exact bracketing
# ---------------------------------------------------------------------------


def _eer_oracle() -> str:
    from .ml import _scored_labeled_sql

    return (
        _scored_labeled_sql()
        + ", "
        + _sql_roc_cum().strip()
        + """
    , pts AS (
      SELECT v, n_sel, tp,
             CAST(n_sel - tp AS DOUBLE) / CAST((SELECT nn - p FROM tot) AS DOUBLE)
               AS fpr,
             1.0::DOUBLE - CAST(tp AS DOUBLE) / CAST((SELECT p FROM tot) AS DOUBLE)
               AS fnr
      FROM cum
    ), lagged AS (
      SELECT v,
             coalesce(lag(fpr) OVER (ORDER BY v DESC), 0.0::DOUBLE) AS fpr1,
             coalesce(lag(fnr) OVER (ORDER BY v DESC), 1.0::DOUBLE) AS fnr1,
             fpr AS fpr2, fnr AS fnr2,
             row_number() OVER (ORDER BY v DESC) AS rn
      FROM pts
    ), cross_ AS (
      SELECT *, row_number() OVER (ORDER BY rn) AS pick
      FROM lagged WHERE fpr2 >= fnr2
    ), sel AS (
      SELECT * FROM cross_ WHERE pick = 1
    )
    SELECT CAST(v AS BIGINT) AS crossing_threshold_q,
           CAST(floor(fpr1 * 1000000.0::DOUBLE + 0.5) AS BIGINT) AS fpr_before_micro,
           CAST(floor(fnr1 * 1000000.0::DOUBLE + 0.5) AS BIGINT) AS fnr_before_micro,
           CAST(floor(fpr2 * 1000000.0::DOUBLE + 0.5) AS BIGINT) AS fpr_after_micro,
           CAST(floor(fnr2 * 1000000.0::DOUBLE + 0.5) AS BIGINT) AS fnr_after_micro,
           CAST(floor(
             (CASE WHEN (fpr2 - fpr1) + (fnr1 - fnr2) > 0.0::DOUBLE THEN
               fpr1 + (fpr2 - fpr1)
                 * ((fnr1 - fpr1) / ((fpr2 - fpr1) + (fnr1 - fnr2)))
             ELSE fpr2 END) * 1000000.0::DOUBLE + 0.5) AS BIGINT) AS eer_micro
    FROM sel
    """
    )


@register("ml_equal_error_rate", oracle=_eer_oracle())
def ml_equal_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal error rate of the classifier against the rule gate: the
    operating point where false-positive and false-negative rates
    cross — biometrics' and speaker-verification's single-number
    summary, and the threshold-free twin of
    ``ml_youden_optimal_threshold`` (Youden maximizes TPR - FPR; EER
    balances the two error types exactly). Reported with the exact
    bracketing pair (the last grid point before the crossing and the
    first after) plus the linear interpolation between them, so the
    consumer sees both the achievable operating points and the
    idealized rate.

    Exactness: the crossing row is picked by the EXACT integer
    condition fp * P >= (P - tp) * N lifted to the doubles only for
    the reported rates; bracketing rates and the interpolated EER are
    mirrored IEEE double expressions off the exact cumulative
    integers, quantized once at micro (degenerate vertical crossings
    fall back to the after-point rate).

    Scale shape: one scored scan to the <= 10001-value grid; the
    cumulative, lag and first-crossing pick are the fbeta/Youden
    allowlist class (entry landed in this same commit). 1 row out.
    """
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    cum, tot = _roc_cum(t)
    pts = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_sel",
        "tp",
        ((F.col("n_sel") - F.col("tp")).cast("double")
         / (F.col("nn") - F.col("p")).cast("double")).alias("fpr"),
        (F.lit(1.0) - F.col("tp").cast("double") / F.col("p").cast("double")).alias(
            "fnr"
        ),
    )
    wlag = Window.orderBy(F.col("v").desc())
    lagged = pts.select(
        "v",
        F.coalesce(F.lag("fpr").over(wlag), F.lit(0.0)).alias("fpr1"),
        F.coalesce(F.lag("fnr").over(wlag), F.lit(1.0)).alias("fnr1"),
        F.col("fpr").alias("fpr2"),
        F.col("fnr").alias("fnr2"),
        F.row_number().over(wlag).alias("rn"),
    )
    wpick = Window.orderBy("rn")
    sel = (
        lagged.where(F.col("fpr2") >= F.col("fnr2"))
        .withColumn("pick", F.row_number().over(wpick))
        .where(F.col("pick") == 1)
    )
    den = (F.col("fpr2") - F.col("fpr1")) + (F.col("fnr1") - F.col("fnr2"))
    eer = F.when(
        den > 0.0,
        F.col("fpr1")
        + (F.col("fpr2") - F.col("fpr1"))
        * ((F.col("fnr1") - F.col("fpr1")) / den),
    ).otherwise(F.col("fpr2"))
    q6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")  # noqa: E731
    return sel.select(
        F.col("v").cast("long").alias("crossing_threshold_q"),
        q6(F.col("fpr1")).alias("fpr_before_micro"),
        q6(F.col("fnr1")).alias("fnr_before_micro"),
        q6(F.col("fpr2")).alias("fpr_after_micro"),
        q6(F.col("fnr2")).alias("fnr_after_micro"),
        q6(eer).alias("eer_micro"),
    )


# ---------------------------------------------------------------------------
# 3. Cost-curve lower envelope over the probability-cost grid
# ---------------------------------------------------------------------------

COST_PC_DEN = 20  # pc grid i/20, i = 1..19


def _cost_env_oracle() -> str:
    from .ml import _scored_labeled_sql

    hd = _sql_halfup_div
    return (
        _scored_labeled_sql()
        + ", "
        + _sql_roc_cum().strip()
        + f"""
    , cum0 AS (
      SELECT n_sel, tp FROM cum
      UNION ALL SELECT 0 AS n_sel, 0 AS tp
    ), pcs AS (
      SELECT unnest(range(1, {COST_PC_DEN})) AS i
    ), nec AS (
      SELECT p.i,
             {hd(f'1000000::HUGEINT * (p.i * (t.p - c.tp) * (t.nn - t.p)'
                 f' + ({COST_PC_DEN} - p.i) * (c.n_sel - c.tp) * t.p)',
                 f'{COST_PC_DEN}::HUGEINT * t.p * (t.nn - t.p)')} AS nec_micro
      FROM pcs p, cum0 c, tot t
    ), env AS (
      SELECT i, CAST(min(nec_micro) AS BIGINT) AS envelope_micro
      FROM nec GROUP BY i
    )
    SELECT CAST(i AS BIGINT) AS pc_num,
           CAST({COST_PC_DEN} AS BIGINT) AS pc_den,
           envelope_micro,
           CAST({hd(f'1000000::HUGEINT * least(i, {COST_PC_DEN} - i)',
                    str(COST_PC_DEN))} AS BIGINT) AS trivial_micro,
           CAST({hd(f'1000000::HUGEINT * least(i, {COST_PC_DEN} - i)',
                    str(COST_PC_DEN))} - envelope_micro AS BIGINT)
             AS gain_micro
    FROM env ORDER BY pc_num
    """
    )


@register("ml_cost_curve_envelope", oracle=_cost_env_oracle())
def ml_cost_curve_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-curve lower envelope (Drummond & Holte 2006): for each
    probability-cost operating condition pc on a 19-point grid, the
    minimum achievable normalized expected cost
    NEC(t; pc) = pc * FNR(t) + (1 - pc) * FPR(t) over every score
    threshold, beside the trivial-classifier cost min(pc, 1 - pc) and
    the gain over it. The ROC convex hull (``ml_roc_convex_hull``)
    shows WHICH thresholds are ever optimal; the cost envelope shows
    HOW MUCH each deployment condition saves — the view that answers
    "is this model worth deploying at MY class ratio" directly.

    Exactness: every NEC value is ONE half-up micro division of exact
    integer cross-products (i (P - tp) N + (20 - i) fp P over 20 P N)
    including the virtual reject-all row; the per-condition envelope
    is an integer MIN; trivial cost and gain are exact micro
    arithmetic.

    Scale shape: one scored scan to the <= 10001-value grid; the
    cumulative is the fbeta/Youden allowlist class (entry landed in
    this same commit); the pc fan is a broadcast 19-row cross of the
    bounded grid. 19 rows out.
    """
    t = Tables(spark, sf_dir)
    cum, tot = _roc_cum(t)
    cum0 = cum.select("n_sel", "tp").unionByName(
        cum.sparkSession.createDataFrame([(0, 0)], "n_sel long, tp long")
    )
    pcs = cum.sparkSession.range(1, COST_PC_DEN).select(
        F.col("id").cast("long").alias("i")
    )
    j = cum0.crossJoin(F.broadcast(pcs)).crossJoin(F.broadcast(tot))
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    nden = F.lit(COST_PC_DEN).cast("decimal(38,0)") * _dec(F.col("p")) * _dec(
        F.col("nn") - F.col("p")
    )
    nnum = m6 * (
        _dec(F.col("i")) * _dec(F.col("p") - F.col("tp")) * _dec(F.col("nn") - F.col("p"))
        + _dec(F.lit(COST_PC_DEN) - F.col("i"))
        * _dec(F.col("n_sel") - F.col("tp"))
        * _dec(F.col("p"))
    )
    nec = j.select("i", _halfup_div(nnum, nden).cast("long").alias("nec_micro"))
    env = nec.groupBy("i").agg(F.min("nec_micro").alias("envelope_micro"))
    triv = _halfup_div(
        m6 * _dec(F.least(F.col("i"), F.lit(COST_PC_DEN) - F.col("i"))),
        F.lit(COST_PC_DEN).cast("decimal(38,0)"),
    ).cast("long")
    return env.select(
        F.col("i").alias("pc_num"),
        F.lit(COST_PC_DEN).cast("long").alias("pc_den"),
        "envelope_micro",
        triv.alias("trivial_micro"),
        (triv - F.col("envelope_micro")).alias("gain_micro"),
    ).orderBy("pc_num")

# ---------------------------------------------------------------------------
# 4. beta-likeness attribute-disclosure audit
# ---------------------------------------------------------------------------

BETA_BUCKET = 500  # n_chars QI bucket width (the t-closeness convention)
BETA_THRESH = ((1, 2), (1, 1), (2, 1))  # beta = 0.5, 1, 2


def _beta_oracle() -> str:
    hd = _sql_halfup_div
    thr_cols = []
    for bn, bd in BETA_THRESH:
        nm = f"share_groups_beta_gt_{bn}_{bd}_micro"
        thr = 1_000_000 * bn // bd
        num = f"1000000::HUGEINT * sum(CASE WHEN mb > {thr} THEN 1 ELSE 0 END)"
        thr_cols.append(f"CAST({hd(num, 'count(*)')} AS BIGINT) AS {nm}")
    return f"""
    WITH docs AS (
      SELECT lang, CAST(n_chars // {BETA_BUCKET} AS BIGINT) AS len_bucket, source
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
    ), cells AS (
      SELECT g.lang, g.len_bucket,
             CASE WHEN g.c::HUGEINT * n.big_n > s.cs::HUGEINT * gs.ng THEN
               {hd('1000000::HUGEINT * (g.c::HUGEINT * n.big_n - s.cs::HUGEINT * gs.ng)',
                   's.cs::HUGEINT * gs.ng')}
             ELSE 0 END AS beta_micro
      FROM grp g
      JOIN gsize gs USING (lang, len_bucket)
      JOIN gsrc s USING (source), n
    ), per_group AS (
      SELECT lang, len_bucket, CAST(max(beta_micro) AS BIGINT) AS mb
      FROM cells GROUP BY lang, len_bucket
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(max(mb) AS BIGINT) AS max_beta_micro,
           {", ".join(thr_cols)}
    FROM per_group
    """


@register("privacy_beta_likeness_audit", oracle=_beta_oracle())
def privacy_beta_likeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """beta-likeness attribute-disclosure audit (Cao & Karras 2012)
    over the shared (lang x n_chars-bucket) quasi-identifier grouping
    with source as the sensitive attribute: a QI group breaches beta
    when some sensitive value's in-group frequency EXCEEDS its global
    baseline by a relative factor > beta, max over values of
    (p_group - p)/p. t-closeness (``privacy_t_closeness_audit``)
    bounds the TOTAL distributional shift; beta-likeness bounds the
    POSITIVE per-value gain — the quantity an attacker actually
    exploits ("members of this group are 3x as likely to be from
    source X"), and negative deviations deliberately do not offset
    it. Reported: group count, worst relative gain, and the share of
    groups breaching beta in {{1/2, 1, 2}}.

    Exactness: the relative gain per (group, value) cell is the exact
    integer comparison c_g * N vs c_v * n_g lifted to ONE half-up
    micro ratio only when positive; per-group maxima and breach
    shares are exact integer aggregates of the quantized cells.

    Scale shape: one document scan to the bounded QI x source grid
    (the t-closeness class); group- and corpus-level aggregates after.
    1 row out.
    """
    t = Tables(spark, sf_dir)
    docs = t.documents.select(
        "lang",
        (F.col("n_chars") / BETA_BUCKET).cast("long").alias("len_bucket"),
        "source",
    )
    grp = docs.groupBy("lang", "len_bucket", "source").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    gsize = grp.groupBy("lang", "len_bucket").agg(F.sum("c").cast("long").alias("ng"))
    gsrc = grp.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("big_n"))
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    cells = (
        grp.join(gsize, ["lang", "len_bucket"])
        .join(F.broadcast(gsrc), "source")
        .crossJoin(F.broadcast(nn))
        .select(
            "lang",
            "len_bucket",
            F.when(
                _dec(F.col("c")) * F.col("big_n") > _dec(F.col("cs")) * F.col("ng"),
                _halfup_div(
                    m6 * (_dec(F.col("c")) * F.col("big_n") - _dec(F.col("cs")) * F.col("ng")),
                    _dec(F.col("cs")) * F.col("ng"),
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("beta_micro"),
        )
    )
    per_group = cells.groupBy("lang", "len_bucket").agg(
        F.max("beta_micro").alias("mb")
    )
    cols = [
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max("mb").alias("max_beta_micro"),
    ]
    for bn, bd in BETA_THRESH:
        thr = 1_000_000 * bn // bd
        cols.append(
            _halfup_div(
                m6 * _dec(F.sum(F.when(F.col("mb") > thr, 1).otherwise(0))),
                _dec(F.count(F.lit(1))),
            )
            .cast("long")
            .alias(f"share_groups_beta_gt_{bn}_{bd}_micro")
        )
    return per_group.agg(*cols)


# ---------------------------------------------------------------------------
# 5. Prosecutor re-identification risk profile
# ---------------------------------------------------------------------------

REID_KS = (5, 10, 20)


def _reid_oracle() -> str:
    hd = _sql_halfup_div
    kcols = []
    for k in REID_KS:
        num = f"1000000::HUGEINT * sum(CASE WHEN ng < {k} THEN ng ELSE 0 END)"
        kcols.append(
            f"CAST({hd(num, 'sum(ng)')} AS BIGINT)"
            f" AS share_records_risk_gt_1_{k}_micro"
        )
    return f"""
    WITH docs AS (
      SELECT lang, CAST(n_chars // {BETA_BUCKET} AS BIGINT) AS len_bucket
      FROM documents
    ), gsize AS (
      SELECT lang, len_bucket, CAST(count(*) AS BIGINT) AS ng
      FROM docs GROUP BY 1, 2
    )
    SELECT CAST(sum(ng) AS BIGINT) AS n_records,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST({hd('1000000::HUGEINT * count(*)', 'sum(ng)')} AS BIGINT)
             AS avg_risk_micro,
           CAST({hd('1000000::HUGEINT', 'min(ng)')} AS BIGINT) AS max_risk_micro,
           {", ".join(kcols)}
    FROM gsize
    """


@register("privacy_reid_risk_prosecutor", oracle=_reid_oracle())
def privacy_reid_risk_prosecutor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prosecutor-model re-identification risk profile over the shared
    (lang x n_chars-bucket) quasi-identifier grouping: the adversary
    knows the target IS in the dataset, so a record's risk is
    1/|its QI group|. Reported: average risk (= groups/records — the
    El Emam expected re-identification rate), maximum risk (1/min
    group size — what ``privacy_k_anonymity_audit``'s k bounds), and
    the share of RECORDS at risk above 1/k for k in {5, 10, 20} (the
    journalist thresholds regulators quote). k-anonymity gives the
    worst case; this gives the whole risk distribution, which is what
    a release decision actually weighs.

    Exactness: group sizes are exact; every reported rate is ONE
    half-up micro division of exact integer sums (risk > 1/k is the
    exact integer condition size < k).

    Scale shape: one document scan to the bounded QI grid; one
    constant-size aggregate. 1 row out.
    """
    t = Tables(spark, sf_dir)
    gsize = (
        t.documents.select(
            "lang", (F.col("n_chars") / BETA_BUCKET).cast("long").alias("len_bucket")
        )
        .groupBy("lang", "len_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ng"))
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    cols = [
        F.sum("ng").cast("long").alias("n_records"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        _halfup_div(m6 * _dec(F.count(F.lit(1))), F.sum(_dec(F.col("ng"))))
        .cast("long")
        .alias("avg_risk_micro"),
        _halfup_div(m6, _dec(F.min("ng"))).cast("long").alias("max_risk_micro"),
    ]
    for k in REID_KS:
        cols.append(
            _halfup_div(
                m6 * F.sum(F.when(F.col("ng") < k, _dec(F.col("ng"))).otherwise(zero)),
                F.sum(_dec(F.col("ng"))),
            )
            .cast("long")
            .alias(f"share_records_risk_gt_1_{k}_micro")
        )
    return gsize.agg(*cols)


# ---------------------------------------------------------------------------
# 6. Covariance participation ratio (exact integer scatter)
# ---------------------------------------------------------------------------

PR_Q = 10_000  # per-element quantization; 1e4 (not the cov-power 1e6)
# keeps tr(S)^2 and ||S||_F^2 inside decimal(38,0) through the x10
# replica and beyond (~1e10 vectors x 64 dims) -- the micro scale
# overflowed at x10 (caught by the pre-registration ladder)


def _pr_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH ex AS (
      SELECT vec_id, i,
             CAST(floor(CAST(x AS DOUBLE) * {PR_Q}.0 + 0.5) AS BIGINT) AS xq
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ), nn AS (
      SELECT CAST(count(DISTINCT vec_id) AS HUGEINT) AS n,
             CAST(max(i) AS BIGINT) AS d
      FROM ex
    ), means AS (
      SELECT i, CAST({hd('CAST(sum(xq) AS HUGEINT)', '(SELECT n FROM nn)')}
                     AS BIGINT) AS m
      FROM ex GROUP BY i
    ), cx AS (
      SELECT e.vec_id, e.i, e.xq - m.m AS c
      FROM ex e JOIN means m USING (i)
    ), scatter AS (
      SELECT a.i AS di, b.i AS dj,
             CAST(sum(a.c::HUGEINT * b.c) AS HUGEINT) AS s
      FROM cx a JOIN cx b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i
    ), traces AS (
      SELECT CAST(sum(CASE WHEN di = dj THEN s ELSE 0 END) AS HUGEINT) AS tr_s,
             CAST(sum(CASE WHEN di = dj THEN s * s ELSE 2 * s * s END)
                  AS HUGEINT) AS frob2
      FROM scatter
    )
    SELECT CAST(n.n AS BIGINT) AS n_vecs, n.d AS dim,
           CAST(t.tr_s AS BIGINT) AS trace_scatter,
           CAST({hd('1000000::HUGEINT * t.tr_s * t.tr_s', 't.frob2')} AS BIGINT)
             AS participation_ratio_micro,
           CAST({hd('1000000::HUGEINT * t.tr_s * t.tr_s', 't.frob2 * n.d')}
                AS BIGINT) AS pr_over_d_micro
    FROM traces t, nn n
    """


@register("embedding_participation_ratio", oracle=_pr_oracle())
def embedding_participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation ratio of the embedding covariance spectrum:
    PR = (sum lambda)^2 / sum lambda^2 = (tr S)^2 / ||S||_F^2 — the
    effective number of dimensions the variance actually occupies
    (PR = d for isotropic, 1 for rank-one), computed WITHOUT any
    eigendecomposition because both invariants come straight off the
    scatter matrix. ``embedding_cov_top_eigen_power`` finds the top
    direction; ``embedding_intrinsic_dim_twonn`` estimates local ID;
    PR is the global spectral-flatness number that decides how many
    PQ subspaces / projection dims are worth keeping, and its exact
    integer form makes it the cheapest of the three.

    Exactness: components micro-quantize once and center on half-up
    integer per-dim means (the cov-power convention); every scatter
    entry S_ij = sum c_i c_j is an exact decimal(38,0) integer, so
    tr S, ||S||_F^2, and the two output ratios are EXACT integer
    arithmetic end to end — no doubles anywhere. The 1e4 per-element
    quantization (vs the cov-power 1e6) keeps the Frobenius sum and
    the (tr S)^2 numerator inside decimal(38,0) out to ~1e10 vectors
    — the x10 ladder caught the micro-scale overflow before any
    driver run (the Bland-Altman class).

    Scale shape: the d^2-fan self-join on vec_id generates d(d+1)/2
    products per vector map-side and partial-aggregates to the
    bounded d x d grid; constant-size algebra after. 1 row out.
    """
    t = Tables(spark, sf_dir)
    ex = (
        t.embeddings.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x"),
        )
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("i"),
            F.floor(F.col("x") * F.lit(float(PR_Q)) + F.lit(0.5))
            .cast("long")
            .alias("xq"),
        )
        .localCheckpoint(eager=False)
    )
    nn = ex.agg(
        F.countDistinct("vec_id").cast("decimal(38,0)").alias("n"),
        F.max("i").cast("long").alias("d"),
    )
    means = (
        ex.groupBy("i")
        .agg(F.sum(_dec(F.col("xq"))).alias("sx"))
        .crossJoin(F.broadcast(nn.select("n")))
        .select("i", _halfup_div(F.col("sx"), F.col("n")).cast("long").alias("m"))
    )
    cx = ex.join(F.broadcast(means), "i").select(
        "vec_id", "i", (F.col("xq") - F.col("m")).alias("c")
    )
    a = cx.select("vec_id", F.col("i").alias("di"), F.col("c").alias("ca"))
    b = cx.select("vec_id", F.col("i").alias("dj"), F.col("c").alias("cb"))
    scatter = (
        a.join(b, "vec_id")
        .where(F.col("di") <= F.col("dj"))
        .groupBy("di", "dj")
        .agg(F.sum(_dec(F.col("ca")) * F.col("cb")).alias("s"))
    )
    traces = scatter.agg(
        F.sum(F.when(F.col("di") == F.col("dj"), F.col("s")).otherwise(
            F.lit(0).cast("decimal(38,0)")
        )).alias("tr_s"),
        F.sum(
            F.when(F.col("di") == F.col("dj"), F.col("s") * F.col("s")).otherwise(
                F.lit(2).cast("decimal(38,0)") * F.col("s") * F.col("s")
            )
        ).alias("frob2"),
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    return traces.crossJoin(F.broadcast(nn)).select(
        F.col("n").cast("long").alias("n_vecs"),
        F.col("d").alias("dim"),
        F.col("tr_s").cast("long").alias("trace_scatter"),
        _halfup_div(m6 * F.col("tr_s") * F.col("tr_s"), F.col("frob2"))
        .cast("long")
        .alias("participation_ratio_micro"),
        _halfup_div(
            m6 * F.col("tr_s") * F.col("tr_s"), F.col("frob2") * _dec(F.col("d"))
        )
        .cast("long")
        .alias("pr_over_d_micro"),
    )
