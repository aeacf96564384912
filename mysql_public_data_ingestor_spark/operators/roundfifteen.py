"""Round-15 banked operator queue, batch 1 — built AND gated in round
14 (same-commit rule: ``tests/test_roundfifteen.py``; SCALE.md §5w
records the ×10 ladder). NOT imported by ``registry._ensure_loaded``
yet; ``activate()`` is the round-15 switch (flip together with
``roundfifteen2.activate()``).

Batch theme — rank-based dependence, order-statistic inference, and
distribution comparison on bounded grids: Hoeffding's D (the
any-dependence rank statistic on the bounded quantity x discount
grid), the distribution-free median CI from binomial order
statistics, entropy l-diversity (the information-theoretic member of
the privacy shelf), the weekday/weekend hourly-profile JS divergence,
closed-form sequence-packing efficiency bounds, and the geometric
word-length fit. Every name was checked against the full 611-name
registry+bank inventory before design (the SCALE §5j.7 authoring
rule).

Activation-time plan-allowlist notes: ``stats_median_ci_orderstat``
uses the bounded distinct-value cumulative (the Bartels class) — add
it to ``SINGLE_PARTITION_ALLOWLIST`` at activation in the same
commit. The other five were swept clean.

Reference parity note: the reference (Go ingestion pipeline,
``/root/reference/main.go``) has no analytics; these extend SURVEY
§2.C warehouse statistics / privacy / time-series / corpus / text.
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
# 1. Hoeffding's D on the bounded quantity x discount grid
# ---------------------------------------------------------------------------


def _hoeffding_oracle() -> str:
    return """
    WITH pts AS (
      SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ), grid AS (
      SELECT x, y, CAST(count(*) AS HUGEINT) AS c FROM pts GROUP BY x, y
    ), nn AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n FROM grid
    ), cell AS (
      SELECT g.x, g.y, g.c,
             CAST(coalesce(sum(CASE WHEN h.x < g.x THEN h.c END), 0) AS HUGEINT)
               AS ltx,
             CAST(coalesce(sum(CASE WHEN h.x = g.x AND h.y <> g.y THEN h.c END), 0)
                  AS HUGEINT) AS eqx_o,
             CAST(coalesce(sum(CASE WHEN h.y < g.y THEN h.c END), 0) AS HUGEINT)
               AS lty,
             CAST(coalesce(sum(CASE WHEN h.y = g.y AND h.x <> g.x THEN h.c END), 0)
                  AS HUGEINT) AS eqy_o,
             CAST(coalesce(sum(CASE WHEN h.x < g.x AND h.y < g.y THEN h.c END), 0)
                  AS HUGEINT) AS ltxy,
             CAST(coalesce(sum(CASE WHEN h.x = g.x AND h.y < g.y THEN h.c END), 0)
                  AS HUGEINT) AS eqx_lty,
             CAST(coalesce(sum(CASE WHEN h.x < g.x AND h.y = g.y THEN h.c END), 0)
                  AS HUGEINT) AS ltx_eqy
      FROM grid g LEFT JOIN grid h ON true
      GROUP BY g.x, g.y, g.c
    ), rk AS (
      -- quadrupled midranks: R4 = 4 + 4 ltx + 2 (c + eqx_o - 1),
      -- Q4 = 4 + 4 ltxy + 2 (eqx_lty + ltx_eqy) + (c + ... - 1)
      SELECT c,
             4 * ltx + 2 * (c + eqx_o - 1) + 4 AS r4,
             4 * lty + 2 * (c + eqy_o - 1) + 4 AS s4,
             4 * ltxy + 2 * (eqx_lty + ltx_eqy) + (c - 1) + 4 AS q4
      FROM cell
    ), sums AS (
      SELECT
        CAST(sum(c * (q4 - 4) * (q4 - 8)) AS HUGEINT) AS d1_16,
        CAST(sum(c * (r4 - 4) * (r4 - 8) * (s4 - 4) * (s4 - 8)) AS HUGEINT)
          AS d2_256,
        CAST(sum(c * (r4 - 8) * (s4 - 8) * (q4 - 4)) AS HUGEINT) AS d3_64
      FROM rk
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(floor(
             30.0::DOUBLE * (
               CAST(n.n - 2 AS DOUBLE) * CAST(n.n - 3 AS DOUBLE)
                 * (CAST(s.d1_16 AS DOUBLE) / 16.0::DOUBLE)
               + CAST(s.d2_256 AS DOUBLE) / 256.0::DOUBLE
               - 2.0::DOUBLE * CAST(n.n - 2 AS DOUBLE)
                 * (CAST(s.d3_64 AS DOUBLE) / 64.0::DOUBLE))
             / (CAST(n.n AS DOUBLE) * CAST(n.n - 1 AS DOUBLE)
                * CAST(n.n - 2 AS DOUBLE) * CAST(n.n - 3 AS DOUBLE)
                * CAST(n.n - 4 AS DOUBLE))
             * 1000000000.0::DOUBLE + 0.5) AS BIGINT) AS hoeffding_d_nano
    FROM sums s, nn n
    """


@_queued("stats_hoeffding_d_qd", _hoeffding_oracle())
def stats_hoeffding_d_qd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D dependence statistic (Hoeffding 1948) between
    line-item quantity and discount, computed exactly on the bounded
    (<= 50 x 11)-cell value grid with quadrupled midranks so every
    tie correction stays integer. Kendall/Spearman/Blomqvist on this
    shelf detect MONOTONE association only; D is consistent against
    ANY dependence with continuous margins (and its rank form is the
    classical test Chatterjee's xi modernizes — xi lives on the
    serial/daily side of the family, D on the bivariate side).

    Exactness: per-cell less-than / equal counts come from ONE
    bounded grid self-join (<= 550^2 cell pairs, never row pairs);
    quadrupled midranks R4/S4/Q4 and the three D-sums are exact
    HUGEINT/decimal(38,0); the final Hoeffding assembly is one
    mirrored IEEE double expression quantized at nano (D lives in
    [-0.5, 1] and is tiny under near-independence).

    Scale shape: one fact scan partial-aggregates to the bounded
    grid; everything after is grid-sized algebra. 1 row out.
    """
    t = Tables(spark, sf_dir)
    pts = t.lineitem.select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x"),
        F.floor(F.col("l_discount") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    grid = pts.groupBy("x", "y").agg(_dec(F.count(F.lit(1))).alias("c"))
    nn = grid.agg(F.sum("c").alias("n"))
    h = grid.select(
        F.col("x").alias("hx"), F.col("y").alias("hy"), F.col("c").alias("hc")
    )
    zero = F.lit(0).cast("decimal(38,0)")
    # bounded-grid pair fan: <= 550-row broadcast against the <= 550-row
    # grid (BroadcastNestedLoopJoin over cells, never row pairs)
    cell = (
        grid.crossJoin(F.broadcast(h))
        .groupBy("x", "y", "c")
        .agg(
            F.sum(F.when(F.col("hx") < F.col("x"), F.col("hc")).otherwise(zero)).alias("ltx"),
            F.sum(
                F.when(
                    (F.col("hx") == F.col("x")) & (F.col("hy") != F.col("y")),
                    F.col("hc"),
                ).otherwise(zero)
            ).alias("eqx_o"),
            F.sum(F.when(F.col("hy") < F.col("y"), F.col("hc")).otherwise(zero)).alias("lty"),
            F.sum(
                F.when(
                    (F.col("hy") == F.col("y")) & (F.col("hx") != F.col("x")),
                    F.col("hc"),
                ).otherwise(zero)
            ).alias("eqy_o"),
            F.sum(
                F.when(
                    (F.col("hx") < F.col("x")) & (F.col("hy") < F.col("y")),
                    F.col("hc"),
                ).otherwise(zero)
            ).alias("ltxy"),
            F.sum(
                F.when(
                    (F.col("hx") == F.col("x")) & (F.col("hy") < F.col("y")),
                    F.col("hc"),
                ).otherwise(zero)
            ).alias("eqx_lty"),
            F.sum(
                F.when(
                    (F.col("hx") < F.col("x")) & (F.col("hy") == F.col("y")),
                    F.col("hc"),
                ).otherwise(zero)
            ).alias("ltx_eqy"),
        )
    )
    four = F.lit(4).cast("decimal(38,0)")
    two = F.lit(2).cast("decimal(38,0)")
    r4 = four * F.col("ltx") + two * (F.col("c") + F.col("eqx_o") - 1) + four
    s4 = four * F.col("lty") + two * (F.col("c") + F.col("eqy_o") - 1) + four
    q4 = (
        four * F.col("ltxy")
        + two * (F.col("eqx_lty") + F.col("ltx_eqy"))
        + (F.col("c") - 1)
        + four
    )
    sums = cell.select(
        "c", r4.alias("r4"), s4.alias("s4"), q4.alias("q4")
    ).agg(
        F.sum(F.col("c") * (F.col("q4") - 4) * (F.col("q4") - 8)).alias("d1_16"),
        F.sum(
            F.col("c")
            * (F.col("r4") - 4)
            * (F.col("r4") - 8)
            * (F.col("s4") - 4)
            * (F.col("s4") - 8)
        ).alias("d2_256"),
        F.sum(
            F.col("c") * (F.col("r4") - 8) * (F.col("s4") - 8) * (F.col("q4") - 4)
        ).alias("d3_64"),
    )
    j = sums.crossJoin(F.broadcast(nn))
    nd = F.col("n").cast("double")
    d = (
        F.lit(30.0)
        * (
            (nd - F.lit(2.0)) * (nd - F.lit(3.0))
            * (F.col("d1_16").cast("double") / F.lit(16.0))
            + F.col("d2_256").cast("double") / F.lit(256.0)
            - F.lit(2.0) * (nd - F.lit(2.0))
            * (F.col("d3_64").cast("double") / F.lit(64.0))
        )
        / (
            nd
            * (nd - F.lit(1.0))
            * (nd - F.lit(2.0))
            * (nd - F.lit(3.0))
            * (nd - F.lit(4.0))
        )
    )
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.floor(d * F.lit(1e9) + F.lit(0.5)).cast("long").alias("hoeffding_d_nano"),
    )


# ---------------------------------------------------------------------------
# 2. Distribution-free median CI from order statistics
# ---------------------------------------------------------------------------

MEDCI_Z = 1.96


def _medci_oracle() -> str:
    z = f"{MEDCI_Z!r}::DOUBLE"
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), nn AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM daily
    ), vals AS (
      SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM daily GROUP BY y
    ), cumv AS (
      SELECT a.y, CAST(coalesce(sum(b.cnt), 0) + a.cnt AS BIGINT) AS cle
      FROM vals a LEFT JOIN vals b ON b.y < a.y
      GROUP BY a.y, a.cnt
    ), ranks AS (
      SELECT n,
             CAST(greatest(1, floor(CAST(n AS DOUBLE) * 0.5::DOUBLE
               - {z} * sqrt(CAST(n AS DOUBLE)) * 0.5::DOUBLE)) AS BIGINT) AS lo_r,
             CAST(least(n, ceil(1.0::DOUBLE + CAST(n AS DOUBLE) * 0.5::DOUBLE
               + {z} * sqrt(CAST(n AS DOUBLE)) * 0.5::DOUBLE)) AS BIGINT) AS hi_r
      FROM nn
    )
    SELECT r.n AS n_days,
           (SELECT min(y) FROM cumv, nn WHERE 2 * cle >= n) AS median,
           (SELECT min(y) FROM cumv c, ranks q WHERE c.cle >= q.lo_r) AS ci_lo,
           (SELECT min(y) FROM cumv c, ranks q WHERE c.cle >= q.hi_r) AS ci_hi,
           r.lo_r AS lo_rank, r.hi_r AS hi_rank
    FROM ranks r
    """


@_queued("stats_median_ci_orderstat", _medci_oracle())
def stats_median_ci_orderstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the MEDIAN daily
    order count from binomial order statistics: the interval
    [X_(l), X_(u)] with l, u = n/2 -+ z sqrt(n)/2 covers the true
    median with >= 95% probability for ANY continuous distribution
    (the sign-test inversion, Hollander & Wolfe §3.5) — no normality,
    no bootstrap resampling (``stats_bootstrap_mean_ci`` covers the
    mean; the median needed its own exact machinery). The practical
    read: capacity planning quotes "median daily volume 4,100
    [4,050, 4,160]" with distribution-free coverage.

    Exactness: the order-statistic RANKS use one mirrored double
    expression (floor/ceil of n/2 -+ z sqrt(n)/2, clamped); selecting
    the ranked values is exact integer comparison against the
    distinct-value cumulative; the median is the standard 2*cle >= n
    order statistic.

    Scale shape: calendar-bounded; one value-grid cumulative
    (single-partition allowlist class — add the entry at activation),
    three order-stat picks. 1 row out.
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
    nd = F.col("n").cast("double")
    lo_r = F.greatest(
        F.lit(1).cast("long"),
        F.floor(nd * F.lit(0.5) - F.lit(MEDCI_Z) * F.sqrt(nd) * F.lit(0.5)).cast(
            "long"
        ),
    )
    hi_r = F.least(
        F.col("n"),
        F.ceil(F.lit(1.0) + nd * F.lit(0.5) + F.lit(MEDCI_Z) * F.sqrt(nd) * F.lit(0.5))
        .cast("long"),
    )
    ranks = nn.select("n", lo_r.alias("lo_r"), hi_r.alias("hi_r"))
    cj = cumv.crossJoin(F.broadcast(ranks))
    return cj.agg(
        F.max("n").alias("n_days"),
        F.min(F.when(2 * F.col("cle") >= F.col("n"), F.col("y"))).alias("median"),
        F.min(F.when(F.col("cle") >= F.col("lo_r"), F.col("y"))).alias("ci_lo"),
        F.min(F.when(F.col("cle") >= F.col("hi_r"), F.col("y"))).alias("ci_hi"),
        F.max("lo_r").alias("lo_rank"),
        F.max("hi_r").alias("hi_rank"),
    )


# ---------------------------------------------------------------------------
# 3. Entropy l-diversity audit
# ---------------------------------------------------------------------------

ELDIV_BUCKET = 500  # the shared QI convention


def _eldiv_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps

    hd = _sql_halfup_div
    return f"""
    WITH docs AS (
      SELECT lang, CAST(n_chars // {ELDIV_BUCKET} AS BIGINT) AS len_bucket, source
      FROM documents
    ), grp AS (
      SELECT lang, len_bucket, source, CAST(count(*) AS BIGINT) AS c
      FROM docs GROUP BY 1, 2, 3
    ), gsize AS (
      SELECT lang, len_bucket, CAST(sum(c) AS BIGINT) AS ng
      FROM grp GROUP BY 1, 2
    ), cells AS (
      SELECT g.lang, g.len_bucket, g.c, s.ng,
             CAST(g.c AS DOUBLE) / CAST(s.ng AS DOUBLE) AS p
      FROM grp g JOIN gsize s USING (lang, len_bucket)
    ), {sql_det_ln_steps('cells', 'p', 'lnp', as_double=True)}
    , terms AS (
      SELECT lang, len_bucket, ng,
             CAST(floor(p * lnp * 1000000000.0::DOUBLE + 0.5) AS BIGINT) AS t_nano
      FROM lnp_rel
    ), ent AS (
      SELECT lang, len_bucket, max(ng) AS ng,
             CAST(-sum(t_nano) AS BIGINT) AS h_nano
      FROM terms GROUP BY lang, len_bucket
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(h_nano) AS BIGINT) AS min_entropy_nano,
           CAST({hd('sum(CAST(ng AS HUGEINT) * h_nano)', 'sum(ng)')} AS BIGINT)
             AS mean_entropy_nano,
           CAST(sum(CASE WHEN h_nano < 693147181 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below_ln2
    FROM ent
    """


@_queued("privacy_entropy_l_diversity", _eldiv_oracle())
def privacy_entropy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy l-diversity audit (Machanavajjhala et al. 2007) over
    the shared (lang x n_chars-bucket) QI grouping with source
    sensitive: a group satisfies entropy l-diversity when the Shannon
    entropy of its sensitive distribution exceeds ln(l). Distinct
    l-diversity (``privacy_l_diversity_audit``) counts VALUES — a
    group with 5 sources at 96%/1%/1%/1%/1% passes distinct-5 while
    being nearly deterministic; the entropy form prices the actual
    uncertainty an attacker faces. Reported: group count, the
    worst-group entropy (the release's effective l is exp of it), the
    record-weighted mean entropy, and how many groups fall below
    ln 2 (effective l < 2 — the red zone).

    Exactness: group/value counts are exact; each cell's p ln p term
    uses the deterministic ``det_ln_dbl`` on an exactly-representable
    integer ratio and quantizes to nano-nats BEFORE the
    order-independent integer sum; the weighted mean is one half-up
    division of exact integers; the ln 2 threshold compares against
    the exact nano constant 693147181.

    Scale shape: one document scan to the bounded QI x source grid;
    group-sized aggregates after. 1 row out.
    """
    from ..functions.detmath import det_ln_dbl

    t = Tables(spark, sf_dir)
    docs = t.documents.select(
        "lang",
        (F.col("n_chars") / ELDIV_BUCKET).cast("long").alias("len_bucket"),
        "source",
    )
    grp = docs.groupBy("lang", "len_bucket", "source").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    gsize = grp.groupBy("lang", "len_bucket").agg(
        F.sum("c").cast("long").alias("ng")
    )
    cells = grp.join(gsize, ["lang", "len_bucket"])
    p = F.col("c").cast("double") / F.col("ng").cast("double")
    terms = cells.select(
        "lang",
        "len_bucket",
        "ng",
        F.floor(p * det_ln_dbl(p) * F.lit(1e9) + F.lit(0.5)).cast("long").alias(
            "t_nano"
        ),
    )
    ent = terms.groupBy("lang", "len_bucket").agg(
        F.max("ng").alias("ng"), (-F.sum("t_nano")).cast("long").alias("h_nano")
    )
    return ent.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("h_nano").alias("min_entropy_nano"),
        _halfup_div(
            F.sum(_dec(F.col("ng")) * F.col("h_nano")), F.sum(_dec(F.col("ng")))
        )
        .cast("long")
        .alias("mean_entropy_nano"),
        F.sum(F.when(F.col("h_nano") < 693147181, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_ln2"),
    )

# ---------------------------------------------------------------------------
# 4. Weekday vs weekend hourly-profile JS divergence
# ---------------------------------------------------------------------------


def _js_wdwe_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps

    return f"""
    WITH ev AS (
      SELECT CAST(hour(ts) AS BIGINT) AS hr,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we
      FROM events
    ), cells AS (
      SELECT hr,
             CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cw,
             CAST(sum(we) AS BIGINT) AS ce
      FROM ev GROUP BY hr
    ), tot AS (
      SELECT CAST(sum(cw) AS BIGINT) AS nw, CAST(sum(ce) AS BIGINT) AS ne
      FROM cells
    ), probs AS (
      SELECT c.hr, c.cw, c.ce, t.nw, t.ne,
             CAST(c.cw AS DOUBLE) / CAST(t.nw AS DOUBLE) AS p,
             CAST(c.ce AS DOUBLE) / CAST(t.ne AS DOUBLE) AS q
      FROM cells c, tot t
    ), withm AS (
      SELECT *, (p + q) * 0.5::DOUBLE AS m,
             CASE WHEN p > 0.0::DOUBLE THEN p / ((p + q) * 0.5::DOUBLE) END AS rp,
             CASE WHEN q > 0.0::DOUBLE THEN q / ((p + q) * 0.5::DOUBLE) END AS rq
      FROM probs
    ), {sql_det_ln_steps('withm', 'rp', 'lnp', as_double=True)}
    , {sql_det_ln_steps('lnp_rel', 'rq', 'lnq', as_double=True)}
    , terms AS (
      SELECT hr,
             CAST(coalesce(floor(0.5::DOUBLE * p * lnp
                                 * 1000000000.0::DOUBLE + 0.5), 0) AS BIGINT)
               + CAST(coalesce(floor(0.5::DOUBLE * q * lnq
                                     * 1000000000.0::DOUBLE + 0.5), 0) AS BIGINT)
               AS t_nano
      FROM lnq_rel
    )
    SELECT (SELECT nw FROM tot) AS n_weekday,
           (SELECT ne FROM tot) AS n_weekend,
           CAST(sum(t_nano) AS BIGINT) AS js_divergence_nano
    FROM terms
    """


@_queued("events_hourly_js_weekday_weekend", _js_wdwe_oracle())
def events_hourly_js_weekday_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the weekday and weekend
    hour-of-day activity profiles — one bounded, symmetric number
    (<= ln 2 nats) for "how different is weekend usage".
    ``events_heatmap_dow_hour`` shows the full surface and
    ``events_weekend_effect_did`` prices the LEVEL difference; the JS
    number prices the SHAPE difference, is finite even where one
    profile has empty hours (unlike KL), and its square root is a
    metric — the right scalar to trend weekly in a drift monitor.

    Exactness: the 24-cell hourly counts are exact; each cell's
    p ln(p/m) / q ln(q/m) terms use the deterministic ``det_ln_dbl``
    on mirrored double ratios and quantize to nano-nats BEFORE the
    24-term integer sum; empty-side cells contribute their exact
    zero limit via NULL-coalesce.

    Scale shape: one fact scan partial-aggregates to 24 cells;
    constant-size algebra after. 1 row out.
    """
    from ..functions.detmath import det_ln_dbl

    t = Tables(spark, sf_dir)
    ev = t.events.select(
        F.hour("ts").cast("long").alias("hr"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("we"),
    )
    cells = ev.groupBy("hr").agg(
        F.sum(F.when(F.col("we") == 0, 1).otherwise(0)).cast("long").alias("cw"),
        F.sum("we").cast("long").alias("ce"),
    )
    tot = cells.agg(
        F.sum("cw").cast("long").alias("nw"), F.sum("ce").cast("long").alias("ne")
    )
    probs = cells.crossJoin(F.broadcast(tot))
    p = F.col("cw").cast("double") / F.col("nw").cast("double")
    q = F.col("ce").cast("double") / F.col("ne").cast("double")
    m = (p + q) * F.lit(0.5)
    tp = F.when(
        p > 0.0,
        F.floor(F.lit(0.5) * p * det_ln_dbl(p / m) * F.lit(1e9) + F.lit(0.5)).cast(
            "long"
        ),
    ).otherwise(F.lit(0).cast("long"))
    tq = F.when(
        q > 0.0,
        F.floor(F.lit(0.5) * q * det_ln_dbl(q / m) * F.lit(1e9) + F.lit(0.5)).cast(
            "long"
        ),
    ).otherwise(F.lit(0).cast("long"))
    terms = probs.select("hr", "nw", "ne", (tp + tq).alias("t_nano"))
    return terms.groupBy().agg(
        F.max("nw").alias("n_weekday"),
        F.max("ne").alias("n_weekend"),
        F.sum("t_nano").cast("long").alias("js_divergence_nano"),
    )


# ---------------------------------------------------------------------------
# 5. Closed-form sequence-packing efficiency bounds
# ---------------------------------------------------------------------------

PACK_CAPS = (512, 1024, 2048, 4096)


def _packbounds_oracle() -> str:
    from .corpus import _SQL_TOKENS

    hd = _sql_halfup_div
    selects = []
    for cap in PACK_CAPS:
        selects.append(f"""
    SELECT CAST({cap} AS BIGINT) AS capacity,
           CAST(sum(lens) AS BIGINT) AS total_tokens,
           CAST((sum(lens) + {cap} - 1) // {cap} AS BIGINT) AS bins_lower_bound,
           CAST(sum((lens + {cap} - 1) // {cap}) AS BIGINT) AS bins_no_concat,
           CAST(1000000 - {hd(f'1000000::HUGEINT * sum(lens)',
                              f'{cap}::HUGEINT * sum((lens + {cap} - 1) // {cap})')}
                AS BIGINT) AS waste_no_concat_micro
    FROM doclens""")
    return f"""
    WITH doclens AS (
      SELECT CAST(len({_SQL_TOKENS}) AS HUGEINT) AS lens FROM documents
    )
    {" UNION ALL ".join(selects)}
    ORDER BY capacity
    """


@_queued("corpus_packing_efficiency_bounds", _packbounds_oracle())
def corpus_packing_efficiency_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form packing-efficiency envelope for training-sequence
    assembly at the four canonical context lengths: the bin-count
    LOWER bound ceil(total/cap) (perfect concatenation — what packed
    pretraining achieves asymptotically) vs the NO-CONCAT bin count
    sum ceil(len_i/cap) (one document per sequence window — the
    padding-heavy baseline), and the padding waste of the baseline.
    The gap between the two columns IS the budget argument for
    sequence packing at each context length;
    ``corpus_pack_sequences`` executes one concrete policy — this
    bounds EVERY policy from both sides, in closed form with no
    sequential pass.

    Exactness: token lengths are exact; both bin counts are exact
    integer ceil-division sums; the waste share is ONE half-up micro
    division per capacity.

    Scale shape: one token-length scan feeds all four capacities
    (Spark computes the four conditional sums in one aggregate fan);
    4 rows out.
    """
    from ..functions.textnorm import whitespace_tokens

    t = Tables(spark, sf_dir)
    lens = t.documents.select(
        F.size(whitespace_tokens(F.col("text"))).cast("long").alias("lens")
    )
    aggs = []
    for cap in PACK_CAPS:
        aggs.extend(
            [
                F.sum(_dec(F.col("lens"))).alias(f"tot_{cap}"),
                F.sum(
                    _dec((F.col("lens") + F.lit(cap - 1) - (F.col("lens") + F.lit(cap - 1)) % cap) / cap)
                ).alias(f"nc_{cap}"),
            ]
        )
    a = lens.agg(*aggs)
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    outs = []
    for cap in PACK_CAPS:
        capd = F.lit(cap).cast("decimal(38,0)")
        tot = F.col(f"tot_{cap}")
        nc = F.col(f"nc_{cap}")
        lb = (tot + (cap - 1) - (tot + (cap - 1)) % capd) / capd
        outs.append(
            a.select(
                F.lit(cap).cast("long").alias("capacity"),
                tot.cast("long").alias("total_tokens"),
                lb.cast("long").alias("bins_lower_bound"),
                nc.cast("long").alias("bins_no_concat"),
                (F.lit(1_000_000) - _halfup_div(m6 * tot, capd * nc))
                .cast("long")
                .alias("waste_no_concat_micro"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("capacity")


# ---------------------------------------------------------------------------
# 6. Geometric word-length fit per language
# ---------------------------------------------------------------------------


def _wordlen_oracle() -> str:
    from .corpus import _SQL_TOKENS

    hd = _sql_halfup_div
    return f"""
    WITH toks AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS tok FROM documents
    ), lens AS (
      SELECT lang, CAST(len(tok) AS BIGINT) AS wl FROM toks WHERE len(tok) > 0
    ), agg AS (
      SELECT lang,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(wl) AS HUGEINT) AS s,
             CAST(max(wl) AS BIGINT) AS max_len,
             CAST(sum(CASE WHEN wl = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n1
      FROM lens GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_tokens,
           CAST({hd('1000::HUGEINT * s', 'n')} AS BIGINT) AS mean_len_milli,
           CAST({hd('1000000::HUGEINT * n', 's')} AS BIGINT) AS geom_p_micro,
           CAST({hd('1000000::HUGEINT * n1', 'n')} AS BIGINT) AS p1_observed_micro,
           CAST({hd('1000000::HUGEINT * n1', 'n')}
                - {hd('1000000::HUGEINT * n', 's')} AS BIGINT)
             AS p1_excess_micro,
           max_len
    FROM agg ORDER BY lang
    """


@_queued("text_word_length_geometric_fit", _wordlen_oracle())
def text_word_length_geometric_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric-distribution fit of the word-length distribution per
    language: the MLE success probability p-hat = 1/mean for a
    geometric on {{1, 2, ...}}, the observed P(len = 1), and the
    excess of observed one-character words over the fitted
    prediction (for a geometric, P(len=1) = p — so the excess column
    is a direct goodness-of-fit residual at the head). Word-length
    distributions are near-geometric for alphabetic languages and
    degenerate for CJK; the excess column flags tokenization damage
    (stray punctuation shards inflate length-1 mass) per language —
    a channel the Zipf/Heaps token-FREQUENCY fits don't see.

    Exactness: length counts and sums are exact integers; all four
    reported rates are single half-up divisions of exact integers
    (the fitted P(len=1) equals p-hat exactly, making the residual
    exact integer arithmetic).

    Scale shape: one token explode partial-aggregates to per-language
    scalars; |langs| rows out.
    """
    from ..functions.textnorm import whitespace_tokens

    t = Tables(spark, sf_dir)
    lens = (
        t.documents.select(
            "lang", F.explode(whitespace_tokens(F.col("text"))).alias("tok")
        )
        .where(F.length("tok") > 0)
        .select("lang", F.length("tok").cast("long").alias("wl"))
    )
    agg = lens.groupBy("lang").agg(
        _dec(F.count(F.lit(1))).alias("n"),
        F.sum(_dec(F.col("wl"))).alias("s"),
        F.max("wl").alias("max_len"),
        F.sum(F.when(F.col("wl") == 1, 1).otherwise(0)).cast("decimal(38,0)").alias("n1"),
    )
    k1 = F.lit(1000).cast("decimal(38,0)")
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n_tokens"),
        _halfup_div(k1 * F.col("s"), F.col("n")).cast("long").alias("mean_len_milli"),
        _halfup_div(m6 * F.col("n"), F.col("s")).cast("long").alias("geom_p_micro"),
        _halfup_div(m6 * F.col("n1"), F.col("n")).cast("long").alias(
            "p1_observed_micro"
        ),
        (
            _halfup_div(m6 * F.col("n1"), F.col("n"))
            - _halfup_div(m6 * F.col("n"), F.col("s"))
        )
        .cast("long")
        .alias("p1_excess_micro"),
        "max_len",
    ).orderBy("lang")
