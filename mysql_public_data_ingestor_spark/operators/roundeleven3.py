"""Round-11 direct registrations, batch B (warehouse statistics).

Six statistics-family completions, each oracle-paired, replica-pinned
and plan-barred in ``tests/test_roundeleven3.py`` (same-commit gate
rule): the Cucconi joint location-scale rank test, Blomqvist's medial
correlation (bounded-domain boundary-bin medians), the seasonal
Mann-Kendall combination, Fleiss' kappa over the shared quality-gate
raters, Tukey's two-way median polish, and a TOST equivalence test in
the signed-squared-t convention.

Reference parity note: the reference (Go ingestion pipeline) has no
analytics; these extend SURVEY §2.C warehouse statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables
from .roundeleven import _dec, _halfup_div, _sql_halfup_div
from .roundeleven2 import _SQL_DAILY_CENTS_IDX, _daily_cents_idx

# ---------------------------------------------------------------------------
# 1. Cucconi joint location-scale test (first vs second calendar half)
# ---------------------------------------------------------------------------


def _cucconi_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH {_SQL_DAILY_CENTS_IDX}
    , nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM idx),
    lab AS (
      SELECT i.day, i.y, i.k, CASE WHEN i.k * 2 <= t.n THEN 0 ELSE 1 END AS grp
      FROM idx i, nn t
    ), rk AS (
      -- rank in the combined sample under the (value, day) total order
      SELECT a.day, a.grp,
             CAST(count(*) AS HUGEINT) AS r
      FROM lab a JOIN lab b
        ON (b.y < a.y) OR (b.y = a.y AND b.day <= a.day)
      GROUP BY a.day, a.grp
    ), uv AS (
      SELECT CAST(sum(CASE WHEN grp = 1 THEN r * r ELSE 0 END) AS HUGEINT) AS u,
             CAST(sum(CASE WHEN grp = 1
                           THEN ((SELECT n FROM nn) + 1 - r)
                              * ((SELECT n FROM nn) + 1 - r) ELSE 0 END)
                  AS HUGEINT) AS v,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS m1
      FROM rk
    ), terms AS (
      SELECT u, v, n2, m1, (m1 + n2) AS nt,
             (2 * (m1 + n2) + 1) * (8 * (m1 + n2) + 11) AS q,
             2 * ((m1 + n2) * (m1 + n2) - 4)
               - (2 * (m1 + n2) + 1) * (8 * (m1 + n2) + 11) AS p,
             6 * u - n2 * ((m1 + n2) + 1) * (2 * (m1 + n2) + 1) AS a,
             6 * v - n2 * ((m1 + n2) + 1) * (2 * (m1 + n2) + 1) AS b
      FROM uv
    )
    SELECT CAST(nt AS BIGINT) AS n_days, CAST(m1 AS BIGINT) AS n_first,
           CAST(n2 AS BIGINT) AS n_second,
           CAST(u AS BIGINT) AS u_stat, CAST(v AS BIGINT) AS v_stat,
           CASE WHEN m1 > 0 AND n2 > 0 AND q*q - p*p > 0 THEN
             {sql_round_big_int_ratio(
                 '5::HUGEINT * (q * (a*a + b*b) - 2 * p * a * b)',
                 '2::HUGEINT * (q*q - p*p) * m1 * n2 * (nt + 1)')}
           END AS cucconi_c
    FROM terms
    """


@register("stats_cucconi_halves", oracle=_cucconi_oracle())
def stats_cucconi_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi joint location-SCALE rank test between the first and
    second halves of the daily-revenue calendar — the two-sample test
    the family lacked: Mann-Whitney sees location only, Ansari-Bradley
    scale only; Cucconi's C = (U*^2 + V*^2 - 2 rho U* V*)/(2(1-rho^2))
    rejects when EITHER moved (and predates + outperforms the
    better-known Lepage combination, Marozzi 2013).

    Exactness: ranks come from the (value, day) lexicographic total
    order (deterministic under ties in both engines — documented tie
    policy, same convention as the rank tests in the family), U and V
    are exact integer rank-square sums, and C reduces to ONE half-up
    1e-6 ratio of exact decimal(38,0)/HUGEINT polynomials:
    C = 5(q(A^2+B^2) - 2pAB) / (2(q^2-p^2) m n (N+1)) with
    A = 6U - n(N+1)(2N+1), B the V twin, q = (2N+1)(8N+11),
    p = 2(N^2-4) - q — the whole standardization algebra cleared of
    square roots before any division happens.

    Scale shape: fact scan collapses to the ~2.4k-day table; the rank
    pass is the house bounded-domain non-equi self-join; everything
    after is 1-row algebra.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    idx = _daily_cents_idx(t)
    nn = idx.agg(F.max("k").alias("n"))
    lab = idx.crossJoin(F.broadcast(nn)).select(
        "day", "y", F.when(F.col("k") * 2 <= F.col("n"), 0).otherwise(1).alias("grp")
    )
    b = lab.select(
        F.col("day").alias("day_b"), F.col("y").alias("y_b")
    )
    rk = (
        lab.join(
            F.broadcast(b),
            (F.col("y_b") < F.col("y"))
            | ((F.col("y_b") == F.col("y")) & (F.col("day_b") <= F.col("day"))),
        )
        .groupBy("day", "grp")
        .agg(_dec(F.count(F.lit(1))).alias("r"))
    )
    tot = rk.agg(_dec(F.count(F.lit(1))).alias("nt"))
    uv = rk.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.when(F.col("grp") == 1, F.col("r") * F.col("r")).otherwise(F.lit(0))
        ).alias("u"),
        F.sum(
            F.when(
                F.col("grp") == 1,
                (F.col("nt") + 1 - F.col("r")) * (F.col("nt") + 1 - F.col("r")),
            ).otherwise(F.lit(0))
        ).alias("v"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("m1"),
    )
    nt = _dec(F.col("m1")) + F.col("n2")
    q = (2 * nt + 1) * (8 * nt + 11)
    p = 2 * (nt * nt - 4) - q
    a = 6 * F.col("u") - _dec(F.col("n2")) * (nt + 1) * (2 * nt + 1)
    bb = 6 * F.col("v") - _dec(F.col("n2")) * (nt + 1) * (2 * nt + 1)
    return uv.select(
        nt.cast("long").alias("n_days"),
        F.col("m1").alias("n_first"),
        F.col("n2").alias("n_second"),
        F.col("u").cast("long").alias("u_stat"),
        F.col("v").cast("long").alias("v_stat"),
        F.when(
            (F.col("m1") > 0) & (F.col("n2") > 0) & (q * q - p * p > 0),
            round_big_int_ratio(
                F.lit(5).cast("decimal(38,0)")
                * (q * (a * a + bb * bb) - 2 * p * a * bb),
                F.lit(2).cast("decimal(38,0)")
                * (q * q - p * p)
                * F.col("m1")
                * F.col("n2")
                * (nt + 1),
            ),
        ).alias("cucconi_c"),
    )


# ---------------------------------------------------------------------------
# 2. Blomqvist's beta (medial correlation) on a bounded-domain grid
# ---------------------------------------------------------------------------


def _blomqvist_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
    WITH grid AS (
      SELECT CAST(l_quantity AS BIGINT) AS xq,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS yq,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
      GROUP BY 1, 2
    ), nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
    mx AS (
      SELECT min(xq) AS med_x FROM (
        SELECT a.xq, CAST(sum(b.c) AS BIGINT) AS cum
        FROM (SELECT DISTINCT xq FROM grid) a
        JOIN grid b ON b.xq <= a.xq GROUP BY a.xq
      ), nn WHERE 2 * cum >= n
    ), my AS (
      SELECT min(yq) AS med_y FROM (
        SELECT a.yq, CAST(sum(b.c) AS BIGINT) AS cum
        FROM (SELECT DISTINCT yq FROM grid) a
        JOIN grid b ON b.yq <= a.yq GROUP BY a.yq
      ), nn WHERE 2 * cum >= n
    ), quad AS (
      SELECT
        CAST(sum(CASE WHEN xq > med_x AND yq > med_y THEN c ELSE 0 END) AS BIGINT) AS n11,
        CAST(sum(CASE WHEN xq < med_x AND yq < med_y THEN c ELSE 0 END) AS BIGINT) AS n22,
        CAST(sum(CASE WHEN xq > med_x AND yq < med_y THEN c ELSE 0 END) AS BIGINT) AS n12,
        CAST(sum(CASE WHEN xq < med_x AND yq > med_y THEN c ELSE 0 END) AS BIGINT) AS n21,
        CAST(sum(CASE WHEN xq = med_x OR yq = med_y THEN c ELSE 0 END) AS BIGINT) AS n_on
      FROM grid, mx, my
    )
    SELECT (SELECT n FROM nn) AS n_rows,
           (SELECT med_x FROM mx) AS median_qty,
           (SELECT med_y FROM my) AS median_disc_cents,
           n11, n22, n12, n21, n_on,
           CASE WHEN n11 + n22 + n12 + n21 > 0 THEN
             {sql_round_big_int_ratio(
                 '(n11::HUGEINT + n22 - n12 - n21)',
                 '(n11::HUGEINT + n22 + n12 + n21)')}
           END AS blomqvist_beta
    FROM quad
    """


@register("stats_blomqvist_beta", oracle=_blomqvist_oracle())
def stats_blomqvist_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blomqvist's beta (the medial correlation coefficient) between
    quantity and discount: the sign-concordance of each row with the
    two medians, (n11+n22-n12-n21)/(n11+n22+n12+n21) — the maximally
    robust member of the correlation family (Pearson uses magnitudes,
    Spearman/Kendall full ranks; Blomqvist needs only which QUADRANT
    of the median cross each point falls in, so a single wild row can
    move it by at most 1/n).

    Boundary-bin exactness: both variables live on bounded integer
    domains (quantity 1..50, discount cents 0..10), so ONE fact scan
    collapses to the <=550-cell grid; the lower medians come from the
    grid's marginal cumulative (min v with 2*cum >= n — deterministic
    under any tie mass), and the quadrant counts are one conditional
    aggregate over the grid. Rows ON either median are counted and
    excluded, the classical treatment. No sort, no window, no
    row-level second pass.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    grid = (
        t.lineitem.filter(
            F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull()
        )
        .groupBy(
            F.col("l_quantity").cast("long").alias("xq"),
            F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("yq"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nn = grid.agg(F.sum("c").cast("long").alias("n"))

    def _median(col):
        marg = grid.groupBy(col).agg(F.sum("c").alias("mc"))
        b = marg.select(F.col(col).alias("vb"), F.col("mc").alias("cb"))
        cum = (
            marg.join(F.broadcast(b), F.col("vb") <= F.col(col))
            .groupBy(col)
            .agg(F.sum("cb").cast("long").alias("cum"))
        )
        return (
            cum.crossJoin(F.broadcast(nn))
            .filter(2 * F.col("cum") >= F.col("n"))
            .agg(F.min(col).alias(f"med_{col}"))
        )

    mx = _median("xq")
    my = _median("yq")
    quad = (
        grid.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(my))
        .agg(
            F.sum(
                F.when(
                    (F.col("xq") > F.col("med_xq")) & (F.col("yq") > F.col("med_yq")),
                    F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n11"),
            F.sum(
                F.when(
                    (F.col("xq") < F.col("med_xq")) & (F.col("yq") < F.col("med_yq")),
                    F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n22"),
            F.sum(
                F.when(
                    (F.col("xq") > F.col("med_xq")) & (F.col("yq") < F.col("med_yq")),
                    F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n12"),
            F.sum(
                F.when(
                    (F.col("xq") < F.col("med_xq")) & (F.col("yq") > F.col("med_yq")),
                    F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n21"),
            F.sum(
                F.when(
                    (F.col("xq") == F.col("med_xq")) | (F.col("yq") == F.col("med_yq")),
                    F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_on"),
            F.max("med_xq").alias("median_qty"),
            F.max("med_yq").alias("median_disc_cents"),
        )
    )
    den = _dec(F.col("n11")) + F.col("n22") + F.col("n12") + F.col("n21")
    return quad.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_rows"),
        "median_qty",
        "median_disc_cents",
        "n11",
        "n22",
        "n12",
        "n21",
        "n_on",
        F.when(
            den > 0,
            round_big_int_ratio(
                _dec(F.col("n11")) + F.col("n22") - F.col("n12") - F.col("n21"), den
            ),
        ).alias("blomqvist_beta"),
    )


# ---------------------------------------------------------------------------
# 3. Seasonal Mann-Kendall (per-ISO-weekday strata, combined z)
# ---------------------------------------------------------------------------


def _smk_oracle() -> str:
    return """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ), ncnt AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY dow
    ), per AS (
      SELECT a.dow,
             CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_mk
      FROM daily a JOIN daily b ON a.dow = b.dow AND a.day < b.day
      GROUP BY a.dow
    ), ties AS (
      SELECT dow, CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie18
      FROM (SELECT dow, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY dow, x)
      WHERE t > 1 GROUP BY dow
    ), strata AS (
      SELECT c.dow, c.n, coalesce(p.s_mk, 0) AS s_mk,
             c.n * (c.n - 1) * (2 * c.n + 5) - coalesce(t.tie18, 0) AS v18
      FROM ncnt c
      LEFT JOIN per p ON p.dow = c.dow
      LEFT JOIN ties t ON t.dow = c.dow
    ), rows_out AS (
      SELECT dow, n, s_mk, v18 FROM strata
      UNION ALL
      SELECT -1 AS dow, CAST(sum(n) AS BIGINT), CAST(sum(s_mk) AS BIGINT),
             CAST(sum(v18) AS BIGINT)
      FROM strata
    )
    SELECT dow, n AS n_days, s_mk, v18 AS var_s_x18,
           CASE WHEN v18 > 0 THEN
             CAST(floor((CASE WHEN s_mk > 0 THEN CAST(s_mk - 1 AS DOUBLE)
                              WHEN s_mk < 0 THEN CAST(s_mk + 1 AS DOUBLE)
                              ELSE 0.0::DOUBLE END)
                        / sqrt(CAST(v18 AS DOUBLE) / 18.0::DOUBLE)
                        * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
           END AS z_mk
    FROM rows_out ORDER BY dow
    """


@register("stats_seasonal_mann_kendall", oracle=_smk_oracle())
def stats_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch-Slack): the MK S
    statistic computed WITHIN each ISO-weekday stratum of the daily
    order-count series, then combined as S* = sum S_d, Var* = sum
    Var_d (dow = -1 row) — the trend test that cannot be fooled by the
    weekly cycle, which inflates plain MK's variance and masks real
    drift (``stats_mann_kendall_daily`` is the unstratified sibling;
    its docstring's z formula is reused verbatim per stratum and for
    the combination, the shared-derivation rule).

    Exactness: identical to the MK op — S and the tie-corrected
    variance (x18 integer units) are exact int64 per stratum and sum
    exactly for the combined row; the one sqrt+divide runs on exact
    integers with the identical continuity-corrected expression in
    both engines.

    Scale shape: the pairwise pass is dow-blocked (7 independent
    ~343-row self-joins on the post-aggregation day table, ~1/7 the
    pairs of the unstratified test), everything bounded by calendar.
    """
    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(
        F.to_date("o_orderdate").alias("day"),
        (F.weekday(F.to_date("o_orderdate")) + 1).cast("long").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    b = daily.select(
        F.col("dow").alias("dow_b"), F.col("day").alias("day_b"), F.col("x").alias("x_b")
    )
    per = (
        daily.join(
            F.broadcast(b),
            (F.col("dow_b") == F.col("dow")) & (F.col("day") < F.col("day_b")),
        )
        .groupBy("dow")
        .agg(
            F.sum(
                F.when(F.col("x_b") > F.col("x"), 1)
                .when(F.col("x_b") < F.col("x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_mk"),
        )
    )
    # n per stratum must count ALL its days (the last day sources no
    # pair), so recount from daily, not from the pair join
    ncnt = daily.groupBy("dow").agg(F.countDistinct("day").cast("long").alias("n"))
    ties = (
        daily.groupBy("dow", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("dow")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tie18")
        )
    )
    strata = (
        ncnt.join(per.select("dow", "s_mk"), "dow", "left")
        .join(ties, "dow", "left")
        .select(
            "dow",
            "n",
            F.coalesce(F.col("s_mk"), F.lit(0)).cast("long").alias("s_mk"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie18"), F.lit(0))
            )
            .cast("long")
            .alias("v18"),
        )
    )
    combined = strata.agg(
        F.lit(-1).cast("long").alias("dow"),
        F.sum("n").cast("long").alias("n"),
        F.sum("s_mk").cast("long").alias("s_mk"),
        F.sum("v18").cast("long").alias("v18"),
    )
    rows_out = strata.unionByName(combined)
    cc = (
        F.when(F.col("s_mk") > 0, (F.col("s_mk") - 1).cast("double"))
        .when(F.col("s_mk") < 0, (F.col("s_mk") + 1).cast("double"))
        .otherwise(F.lit(0.0))
    )
    z = F.floor(
        cc / F.sqrt(F.col("v18").cast("double") / F.lit(18.0)) * 1e6 + F.lit(0.5)
    ).cast("long") / F.lit(1e6)
    return rows_out.select(
        "dow",
        F.col("n").alias("n_days"),
        "s_mk",
        F.col("v18").alias("var_s_x18"),
        F.when(F.col("v18") > 0, z).alias("z_mk"),
    ).orderBy("dow")


# ---------------------------------------------------------------------------
# 4. Fleiss' kappa over the three shared quality-gate "raters"
# ---------------------------------------------------------------------------


def _fleiss_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio
    from .corpus import _SQL_TOKENS
    from .roundeight import (
        COCHRAN_MIN_SENTENCES,
        MCNEMAR_MIN_CHARS,
        MCNEMAR_MIN_TOKENS,
    )

    return f"""
    WITH flags AS (
      SELECT CASE WHEN n_chars >= {MCNEMAR_MIN_CHARS} THEN 1 ELSE 0 END
             + CASE WHEN len({_SQL_TOKENS}) >= {MCNEMAR_MIN_TOKENS} THEN 1 ELSE 0 END
             + CASE WHEN len(string_split(text, '.')) - 1 >= {COCHRAN_MIN_SENTENCES}
                    THEN 1 ELSE 0 END AS l
      FROM documents
    ), agg AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(l) AS HUGEINT) AS sl,
             CAST(sum(l * l) AS HUGEINT) AS sll
      FROM flags
    ), terms AS (
      SELECT n, sl, sll, 3 * n AS t,
             (sll - 3 * sl + 3 * n) AS pbar_num,
             (sl * sl + (3 * n - sl) * (3 * n - sl)) AS pe_num
      FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(sl AS BIGINT) AS total_passes,
           {sql_round_big_int_ratio('pbar_num', '3 * n')} AS p_bar,
           {sql_round_big_int_ratio('pe_num', 't * t')} AS p_e,
           CASE WHEN 3 * n * t * t - 3 * n * pe_num > 0 THEN
             {sql_round_big_int_ratio(
                 'pbar_num * t * t - 3 * n * pe_num',
                 '3 * n * t * t - 3 * n * pe_num')}
           END AS fleiss_kappa
    FROM terms
    """


@register("stats_fleiss_kappa_gates", oracle=_fleiss_oracle())
def stats_fleiss_kappa_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa treating the three shared binary quality gates
    (char-length, token-count, sentence-count — the SAME gate
    constants as ``stats_cochran_q_gates`` and the McNemar pair, the
    shared-derivation rule) as three raters classifying each document
    pass/fail: chance-corrected AGREEMENT, the complement of Cochran's
    Q (Q asks whether the gates admit different fractions; kappa asks
    whether they agree on WHICH documents, which is what deciding to
    collapse redundant gates needs).

    With binary categories and m=3 raters, P_i = (L^2-3L+3)/3 for
    per-doc pass count L, so P-bar = (SLL-3SL+3n)/(3n) and
    P_e = (SL^2+(T-SL)^2)/T^2 with T = 3n — kappa reduces to one
    half-up 1e-6 ratio of exact decimal(38,0)/HUGEINT polynomials in
    the three sufficient sums (n, SL, SLL) off ONE scan.
    """
    from ..functions.exact import round_big_int_ratio
    from ..functions.textnorm import whitespace_tokens
    from .roundeight import (
        COCHRAN_MIN_SENTENCES,
        MCNEMAR_MIN_CHARS,
        MCNEMAR_MIN_TOKENS,
    )

    t = Tables(spark, sf_dir)
    a = F.when(F.col("n_chars") >= MCNEMAR_MIN_CHARS, 1).otherwise(0)
    b = F.when(
        F.size(whitespace_tokens(F.col("text"))) >= MCNEMAR_MIN_TOKENS, 1
    ).otherwise(0)
    c = F.when(
        F.size(F.split(F.col("text"), "\\.", -1)) - 1 >= COCHRAN_MIN_SENTENCES, 1
    ).otherwise(0)
    agg = t.documents.select((a + b + c).alias("l")).agg(
        _dec(F.count(F.lit(1))).alias("n"),
        _dec(F.sum("l")).alias("sl"),
        _dec(F.sum(F.col("l") * F.col("l"))).alias("sll"),
    )
    tt = 3 * F.col("n")
    pbar_num = F.col("sll") - 3 * F.col("sl") + 3 * F.col("n")
    pe_num = F.col("sl") * F.col("sl") + (tt - F.col("sl")) * (tt - F.col("sl"))
    kden = 3 * F.col("n") * tt * tt - 3 * F.col("n") * pe_num
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("sl").cast("long").alias("total_passes"),
        round_big_int_ratio(pbar_num, 3 * F.col("n")).alias("p_bar"),
        round_big_int_ratio(pe_num, tt * tt).alias("p_e"),
        F.when(
            kden > 0,
            round_big_int_ratio(
                pbar_num * tt * tt - 3 * F.col("n") * pe_num, kden
            ),
        ).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# 5. Tukey two-way median polish (nation x priority order counts)
# ---------------------------------------------------------------------------


def _polish_oracle() -> str:
    return """
    WITH cells0 AS (
      SELECT c.c_nationkey AS nationkey, o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS cell
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), spine AS (
      SELECT n.n_nationkey AS nationkey, p.priority
      FROM nation n,
           (SELECT DISTINCT o_orderpriority AS priority FROM orders) p
    ), cells AS (
      SELECT s.nationkey, s.priority, coalesce(c0.cell, 0) AS cell
      FROM spine s LEFT JOIN cells0 c0
        ON c0.nationkey = s.nationkey AND c0.priority = s.priority
    ), rowmed AS (
      SELECT nationkey,
             list_sort(list(cell))[(count(*) + 1) // 2] AS row_med
      FROM cells GROUP BY nationkey
    ), sweep1 AS (
      SELECT c.nationkey, c.priority, c.cell, r.row_med,
             c.cell - r.row_med AS r1
      FROM cells c JOIN rowmed r ON r.nationkey = c.nationkey
    ), colmed AS (
      SELECT priority,
             list_sort(list(r1))[(count(*) + 1) // 2] AS col_med
      FROM sweep1 GROUP BY priority
    )
    SELECT s.nationkey, s.priority, s.cell,
           CAST(s.row_med AS BIGINT) AS row_effect,
           CAST(m.col_med AS BIGINT) AS col_effect,
           CAST(s.r1 - m.col_med AS BIGINT) AS residual
    FROM sweep1 s JOIN colmed m ON m.priority = s.priority
    ORDER BY s.nationkey, s.priority
    """


@register("stats_median_polish_2way", oracle=_polish_oracle())
def stats_median_polish_2way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's two-way MEDIAN POLISH on the nation x priority
    order-count table (one row sweep, one column sweep): the robust
    alternative to ``stats_two_way_anova_price``'s mean decomposition —
    effects are medians, so a single anomalous cell (one nation
    dumping one priority) lands entirely in its own residual instead
    of leaking into every margin the way means do. The residual table
    IS the anomaly report.

    Exactness: the grid is complete by construction — the 25-nation x
    5-priority spine (both ODD) is cross-joined from the dimension
    tables and zero-filled, so every row median is the exact middle of
    5 integers and every column median the exact middle of 25 integers
    (sorted-array middle element, no averaging of two middles, no
    doubles anywhere). Integer in, integer out.

    Scale shape: the fact scan partial-aggregates to <=125 cells; the
    sweeps are two tiny grouped sorted-array medians joined back by
    key. The spine cross-join is broadcast dimension x dimension.
    """
    t = Tables(spark, sf_dir)
    cells0 = (
        t.orders.join(
            t.customer.select("c_custkey", "c_nationkey"),
            t.orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cell"))
    )
    spine = t.nation.select(F.col("n_nationkey").alias("nationkey")).crossJoin(
        F.broadcast(
            t.orders.select(
                F.col("o_orderpriority").alias("priority")
            ).distinct()
        )
    )
    cells = spine.join(cells0, ["nationkey", "priority"], "left").select(
        "nationkey",
        "priority",
        F.coalesce(F.col("cell"), F.lit(0)).cast("long").alias("cell"),
    )
    mid = lambda arr, n: F.element_at(F.array_sort(arr), (n + 1) // 2)  # noqa: E731
    rowmed = cells.groupBy("nationkey").agg(
        F.element_at(
            F.array_sort(F.collect_list("cell")),
            ((F.count(F.lit(1)) + 1) / 2).cast("int"),
        ).alias("row_med")
    )
    sweep1 = cells.join(rowmed, "nationkey").select(
        "nationkey",
        "priority",
        "cell",
        "row_med",
        (F.col("cell") - F.col("row_med")).alias("r1"),
    )
    colmed = sweep1.groupBy("priority").agg(
        F.element_at(
            F.array_sort(F.collect_list("r1")),
            ((F.count(F.lit(1)) + 1) / 2).cast("int"),
        ).alias("col_med")
    )
    return (
        sweep1.join(F.broadcast(colmed), "priority")
        .select(
            "nationkey",
            "priority",
            "cell",
            F.col("row_med").cast("long").alias("row_effect"),
            F.col("col_med").cast("long").alias("col_effect"),
            (F.col("r1") - F.col("col_med")).cast("long").alias("residual"),
        )
        .orderBy("nationkey", "priority")
    )


# ---------------------------------------------------------------------------
# 6. TOST equivalence test (A/B on event value, signed-squared-t)
# ---------------------------------------------------------------------------

TOST_MARGIN_PCT = 5  # equivalence margin: 5% of the pooled mean
TOST_T_CRIT_SQ_MICRO = 2_706_025  # 1.645^2 at 1e-6 (one-sided z, alpha=.05)


def _tost_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH ab AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ), m AS (
      SELECT
        CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
        CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
        CAST(sum(CASE WHEN grp = 0 THEN v ELSE 0 END) AS HUGEINT) AS s1,
        CAST(sum(CASE WHEN grp = 1 THEN v ELSE 0 END) AS HUGEINT) AS s2,
        CAST(sum(CASE WHEN grp = 0 THEN v::HUGEINT * v ELSE 0 END) AS HUGEINT) AS q1,
        CAST(sum(CASE WHEN grp = 1 THEN v::HUGEINT * v ELSE 0 END) AS HUGEINT) AS q2
      FROM ab
    ), micro AS (
      SELECT n1, n2,
        {hd('1000000::HUGEINT * (s1 * n2 - s2 * n1)', 'n1 * n2')} AS d_micro,
        {hd(f'1000000::HUGEINT * {TOST_MARGIN_PCT} * (s1 + s2)',
            '100::HUGEINT * (n1 + n2)')} AS delta_micro,
        -- var_g / n_g directly: the n_g^2 (n_g - 1) denominator IS the
        -- Welch per-group SE^2 term (var/n), so the two just sum
        {hd('1000000::HUGEINT * (n1 * q1 - s1 * s1)', 'n1 * n1 * (n1 - 1)')} AS v1_micro,
        {hd('1000000::HUGEINT * (n2 * q2 - s2 * s2)', 'n2 * n2 * (n2 - 1)')} AS v2_micro
      FROM m WHERE n1 > 1 AND n2 > 1
    ), se AS (
      SELECT *, (v1_micro + v2_micro) AS se2_micro
      FROM micro
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           CAST(d_micro AS DOUBLE) / 1000000 AS mean_diff_cents,
           CAST(delta_micro AS DOUBLE) / 1000000 AS margin_cents,
           CASE WHEN se2_micro > 0 THEN
             CAST({hd('(d_micro + delta_micro) * (d_micro + delta_micro)',
                      'se2_micro')} AS DOUBLE) / 1000000
               * (CASE WHEN d_micro + delta_micro < 0 THEN -1 ELSE 1 END)
           END AS t_lower_sq_signed,
           CASE WHEN se2_micro > 0 THEN
             CAST({hd('(delta_micro - d_micro) * (delta_micro - d_micro)',
                      'se2_micro')} AS DOUBLE) / 1000000
               * (CASE WHEN delta_micro - d_micro < 0 THEN -1 ELSE 1 END)
           END AS t_upper_sq_signed,
           CASE WHEN se2_micro > 0 THEN
             (d_micro + delta_micro > 0 AND delta_micro - d_micro > 0
              AND {hd('(d_micro + delta_micro) * (d_micro + delta_micro)',
                      'se2_micro')} > {TOST_T_CRIT_SQ_MICRO}
              AND {hd('(delta_micro - d_micro) * (delta_micro - d_micro)',
                      'se2_micro')} > {TOST_T_CRIT_SQ_MICRO})
           END AS equivalent
    FROM se
    """


@register("stats_tost_equivalence_ab", oracle=_tost_oracle())
def stats_tost_equivalence_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST (two one-sided tests) EQUIVALENCE test on the user-parity
    A/B split of event value: rejects "the groups differ by more than
    the margin" rather than failing to reject "they differ" — the
    correct statistic for validating that an A/B harness is balanced
    (``stats_ttest_ab`` answers the opposite question;
    ``dq_ab_sample_ratio_mismatch`` audits counts, this audits the
    metric). Margin = 5% of the pooled mean; both one-sided statistics
    must clear the z critical value.

    Exactness convention: like ``stats_tukey_hsd_priority``'s
    q_signed_sq, the t statistics are reported as SIGNED SQUARES —
    t^2 = (d +/- delta)^2 / SE^2 is a ratio of exact integers (Welch
    SE^2 from the sufficient sums, each stage half-up micro-quantized
    identically in both engines), so no square root ever runs; the
    decision compares t^2 against the squared critical value with the
    sign guarding direction.

    Scale shape: ONE scan to six sufficient sums; everything after is
    1-row algebra.
    """
    t = Tables(spark, sf_dir)
    ab = t.events.filter(F.col("value").isNotNull()).select(
        (F.col("user_id") % 2).alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    m = ab.agg(
        _dec(F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))).alias("n1"),
        _dec(F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))).alias("n2"),
        _dec(F.sum(F.when(F.col("grp") == 0, F.col("v")).otherwise(0))).alias("s1"),
        _dec(F.sum(F.when(F.col("grp") == 1, F.col("v")).otherwise(0))).alias("s2"),
        F.sum(F.when(F.col("grp") == 0, _dec(F.col("v")) * F.col("v")).otherwise(0)).alias("q1"),
        F.sum(F.when(F.col("grp") == 1, _dec(F.col("v")) * F.col("v")).otherwise(0)).alias("q2"),
    ).filter((F.col("n1") > 1) & (F.col("n2") > 1))
    mm = F.lit(1_000_000).cast("decimal(38,0)")
    micro = m.select(
        "n1",
        "n2",
        _halfup_div(
            mm * (F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")),
            F.col("n1") * F.col("n2"),
        ).alias("d_micro"),
        _halfup_div(
            mm * TOST_MARGIN_PCT * (F.col("s1") + F.col("s2")),
            F.lit(100).cast("decimal(38,0)") * (F.col("n1") + F.col("n2")),
        ).alias("delta_micro"),
        _halfup_div(
            mm * (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")),
            F.col("n1") * F.col("n1") * (F.col("n1") - 1),
        ).alias("v1_micro"),
        _halfup_div(
            mm * (F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2")),
            F.col("n2") * F.col("n2") * (F.col("n2") - 1),
        ).alias("v2_micro"),
    )
    # v{1,2}_micro are already var_g/n_g (the n_g^2(n_g-1) denominator),
    # so Welch SE^2 is their plain sum — an earlier draft divided by n_g
    # AGAIN on both sides and passed oracle parity (the §5i.11
    # twin-sided class); the float TOST anchor in the replica caught it.
    se = micro.select(
        "*",
        (F.col("v1_micro") + F.col("v2_micro")).alias("se2_micro"),
    )
    lo = F.col("d_micro") + F.col("delta_micro")
    hi = F.col("delta_micro") - F.col("d_micro")
    t_lo = _halfup_div(lo * lo, F.col("se2_micro"))
    t_hi = _halfup_div(hi * hi, F.col("se2_micro"))
    crit = F.lit(TOST_T_CRIT_SQ_MICRO).cast("decimal(38,0)")
    return se.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        (F.col("d_micro").cast("double") / F.lit(1e6)).alias("mean_diff_cents"),
        (F.col("delta_micro").cast("double") / F.lit(1e6)).alias("margin_cents"),
        F.when(
            F.col("se2_micro") > 0,
            t_lo.cast("double")
            / F.lit(1e6)
            * F.when(lo < 0, F.lit(-1.0)).otherwise(F.lit(1.0)),
        ).alias("t_lower_sq_signed"),
        F.when(
            F.col("se2_micro") > 0,
            t_hi.cast("double")
            / F.lit(1e6)
            * F.when(hi < 0, F.lit(-1.0)).otherwise(F.lit(1.0)),
        ).alias("t_upper_sq_signed"),
        F.when(
            F.col("se2_micro") > 0,
            (lo > 0) & (hi > 0) & (t_lo > crit) & (t_hi > crit),
        ).alias("equivalent"),
    )
