"""Round-9 second operator batch (queue-structured, ACTIVATED in
round 9).

Built and fully gated mid-round as a round-10 bank (oracle parity,
plan checks, fuzz profiles, replica tests via
``tests/test_roundten.py``), then activated in the SAME round: the
banking pattern exists for FULL driver windows, and round 9's window
closed at 48/50 with these included — registering now gets all six
driver-verified a round earlier.

Batch theme: remaining family corners — Page's trend test (the
ordered-alternative member of the Friedman block design), linear
counting (the bitmap-fill-rate cardinality sketch beside KMV and the
exact bitmap), discrete churn hazard (the derivative view of the
Kaplan-Meier curve), Benford second-digit forensics, binary-payload
dedup (the multimodal family's blob-store planner), and a Gamma
method-of-moments fit (completing Weibull/NegBin/Gumbel).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import Tables

QUEUE: list[tuple] = []


def _queued(name: str, oracle: str):
    def deco(fn):
        QUEUE.append((name, fn, oracle, fn.__doc__ or ""))
        return fn

    return deco


_ACTIVATED = False


def activate() -> None:
    """Register every queued query (round-10 switch; idempotent)."""
    global _ACTIVATED
    if _ACTIVATED:
        return
    from ..registry import register

    for name, fn, oracle, doc in QUEUE:
        register(name, oracle=oracle, doc=doc)(fn)
    _ACTIVATED = True


def _dec(c):
    return c.cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# 1. Page's L trend test: ordered priority effect, blocked by nation
# ---------------------------------------------------------------------------


def _page_l_oracle() -> str:
    return """
    WITH cells AS (
      SELECT c.c_nationkey AS blk, o.o_orderpriority AS trt,
             CAST(count(*) AS BIGINT) AS n_cell,
             CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)::HUGEINT)
                  AS HUGEINT) AS s_cell
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), kk AS (
      SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM cells
    ), complete AS (
      SELECT blk FROM cells, kk GROUP BY blk, kk.k
      HAVING count(*) = max(kk.k)
    ), ranked AS (
      SELECT c.blk, c.trt,
             CAST(substr(c.trt, 1, 1) AS BIGINT) AS j,
             CAST(row_number() OVER (PARTITION BY c.blk
                  ORDER BY CAST(c.s_cell AS DOUBLE) / c.n_cell, c.trt)
                  AS BIGINT) AS rnk
      FROM cells c JOIN complete b USING (blk)
    ), l AS (
      SELECT CAST(sum(j * rnk) AS BIGINT) AS page_l FROM ranked
    ), s AS (
      SELECT CAST(max(kk.k) AS BIGINT) AS k,
             CAST(count(*) AS BIGINT) AS b
      FROM complete, kk GROUP BY kk.k
    )
    SELECT s.k, s.b AS n_blocks, l.page_l,
           s.b * s.k * (s.k + 1) * (s.k + 1) AS e_l_x4,
           CASE WHEN s.b > 0 AND s.k > 1 THEN
             CAST(floor(3.0::DOUBLE
                        * CAST(4 * l.page_l
                               - s.b * s.k * (s.k + 1) * (s.k + 1) AS DOUBLE)
                        / sqrt(CAST(s.b * s.k * s.k * (s.k + 1)
                                    * (s.k * s.k - 1) AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
           END AS z_page
    FROM l, s
    """


@_queued("stats_page_trend_l", oracle=_page_l_oracle())
def stats_page_trend_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test for an ORDERED priority effect on mean
    order value, blocked by customer nation: L = sum_j j * R_j over
    the same within-block rank table Friedman uses
    (``stats_friedman_nation_priority``) — Friedman asks "do the
    priorities differ at all", Page concentrates the power on the
    ordered alternative (value rising monotonically from 1-URGENT to
    5-LOW), the blocked twin of Jonckheere-Terpstra.

    Reuses the Friedman construction verbatim (complete blocks only;
    deterministic (mean, label) rank ordering, tie-free by total
    order); the treatment index j is the priority label's leading
    digit. L, E(L)x4 = b k (k+1)^2 and Var(L)x144 = b k^2 (k+1)
    (k^2-1) are exact integers; z = 3(4L - E4)/sqrt(V144) evaluates
    in double once, quantized half-up 1e-6. The ranked table is
    |nations| x |priorities| rows off one partial-aggregated join.
    """
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
    w = Window.partitionBy("blk").orderBy(
        F.col("s_cell").cast("double") / F.col("n_cell"), F.col("trt")
    )
    ranked = cells.join(complete, "blk").select(
        F.substring("trt", 1, 1).cast("long").alias("j"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )
    l_ = ranked.agg(F.sum(F.col("j") * F.col("rnk")).alias("page_l"))
    s = complete.agg(F.count(F.lit(1)).alias("b")).crossJoin(F.broadcast(kk))
    st = l_.crossJoin(F.broadcast(s))
    e4 = F.col("b") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)
    v144 = (
        F.col("b")
        * F.col("k")
        * F.col("k")
        * (F.col("k") + 1)
        * (F.col("k") * F.col("k") - 1)
    )
    z = (
        F.lit(3.0)
        * (4 * F.col("page_l") - e4).cast("double")
        / F.sqrt(v144.cast("double"))
    )
    return st.select(
        "k",
        F.col("b").alias("n_blocks"),
        "page_l",
        e4.alias("e_l_x4"),
        F.when(
            (F.col("b") > 0) & (F.col("k") > 1),
            F.floor(z * F.lit(1000000.0) + F.lit(0.5)).cast("long") / F.lit(1e6),
        ).alias("z_page"),
    )


# ---------------------------------------------------------------------------
# 2. Linear counting (bitmap fill rate) distinct-user estimate + audit
# ---------------------------------------------------------------------------

LC_M = 4096


def _linear_counting_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    m = LC_M
    return f"""
    WITH h AS (
      SELECT DISTINCT (('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 15)))::BIGINT
               % {m} AS bucket
      FROM events
    ), occ AS (SELECT CAST(count(*) AS BIGINT) AS occupied FROM h),
    ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS d_exact FROM events),
    {{LN_M}}, {{LN_V}}
    SELECT o.occupied, CAST({m} AS BIGINT) AS m, x.d_exact,
           CASE WHEN o.occupied < {m} THEN lnv.d_lc_est END AS d_lc_est,
           CASE WHEN o.occupied < {m} AND x.d_exact > 0 THEN
             {sql_round_int_ratio('abs(lnv.d_lc_est - x.d_exact)', 'x.d_exact')}
           END AS rel_error
    FROM occ o, ex x, lnv_rel lnv
    """


def _lc_ln_ctes() -> tuple[str, str]:
    from ..functions.detmath import sql_det_ln_steps

    m = LC_M
    base = f"""lnbase AS (
      SELECT occupied, CAST({m} AS BIGINT) AS mm,
             CAST({m} AS BIGINT) - occupied AS vv
      FROM occ
    ), {sql_det_ln_steps('lnbase', 'mm', 'lm')}"""
    est = f"""{sql_det_ln_steps('lm_rel', 'vv', 'lv')},
    lnv_rel AS (
      SELECT *,
             CAST((2 * {m}::HUGEINT * (lm - lv) + 1000000)
                  // 2000000 AS BIGINT) AS d_lc_est
      FROM lv_rel
    )"""
    return base, est


def _linear_counting_oracle_full() -> str:
    base, est = _lc_ln_ctes()
    return _linear_counting_oracle().replace("{LN_M}", base).replace("{LN_V}", est)


@_queued("sketch_linear_counting_users", oracle=_linear_counting_oracle_full())
def sketch_linear_counting_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear counting estimate of distinct event users: hash users
    into an m=4096-bucket bitmap and estimate D = m ln(m/V) from the
    count V of EMPTY buckets — the fill-rate cardinality sketch that
    completes the distinct-count family (exact bitmap = exact at
    bitmap cost; KMV = order statistics; linear counting = the
    small-range estimator HLL itself falls back to), reported beside
    the exact count with its relative error like every sketch audit
    in the registry.

    Mergeable by construction (bitmaps OR; the occupied-bucket set is
    a distinct-agg over bucket ids, which is exactly a map-side
    partial bitmap per partition). ln(m/V) = det-ln(m) - det-ln(V) in
    exact 1e-6 fixed-point units, so the estimate is an exact
    half-up integer division — bit-identical cross-engine. NULL at
    saturation (V = 0), where the estimator is undefined.
    """
    from ..functions.detmath import det_ln_q
    from ..functions.exact import round_int_ratio
    from ..functions.textnorm import sha256_prefix_i64

    m = LC_M
    t = Tables(spark, sf_dir)
    occ = (
        t.events.select(
            (sha256_prefix_i64(F.col("user_id").cast("string")) % m).alias("bucket")
        )
        .distinct()
        .agg(F.count(F.lit(1)).alias("occupied"))
    )
    ex = t.events.agg(F.countDistinct("user_id").alias("d_exact"))
    base = occ.select(
        "occupied",
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("occupied")).alias("vv"),
    )
    lncols = base.select(
        "occupied",
        "m",
        det_ln_q(F.col("m")).alias("lm"),
        det_ln_q(F.col("vv")).alias("lv"),
    )
    est_num = F.lit(2) * F.lit(m).cast("decimal(38,0)") * (F.col("lm") - F.col("lv")) + F.lit(
        1000000
    )
    est = (est_num - est_num % 2000000) / 2000000
    out = lncols.crossJoin(F.broadcast(ex))
    return out.select(
        "occupied",
        "m",
        "d_exact",
        F.when(F.col("occupied") < m, est.cast("long")).alias("d_lc_est"),
        F.when(
            (F.col("occupied") < m) & (F.col("d_exact") > 0),
            round_int_ratio(
                F.abs(est.cast("long") - F.col("d_exact")), F.col("d_exact")
            ),
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# 3. Discrete churn hazard by tenure week
# ---------------------------------------------------------------------------

HAZARD_MAX_W = 12


def _hazard_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH u AS (
      SELECT user_id,
             date_trunc('week', min(ts)) AS first_w,
             date_trunc('week', max(ts)) AS last_w
      FROM events GROUP BY user_id
    ), mx AS (SELECT date_trunc('week', max(ts)) AS max_w FROM events),
    ua AS (
      SELECT CAST(date_diff('week', first_w, last_w) AS BIGINT) AS tenure,
             CAST(date_diff('week', first_w, max_w) AS BIGINT) AS age
      FROM u, mx
    ), ws AS (SELECT CAST(unnest(range(0, {HAZARD_MAX_W + 1})) AS BIGINT) AS w),
    cells AS (
      SELECT ws.w,
             CAST(sum(CASE WHEN ua.age >= ws.w AND ua.tenure >= ws.w
                           THEN 1 ELSE 0 END) AS BIGINT) AS at_risk,
             CAST(sum(CASE WHEN ua.tenure = ws.w AND ua.age > ws.w
                           THEN 1 ELSE 0 END) AS BIGINT) AS churned
      FROM ws, ua GROUP BY ws.w
    )
    SELECT w, at_risk, churned,
           CASE WHEN at_risk > 0 THEN
             {sql_round_int_ratio('churned', 'at_risk')}
           END AS hazard
    FROM cells ORDER BY w
    """


@_queued("events_churn_hazard_by_tenure", oracle=_hazard_oracle())
def events_churn_hazard_by_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete churn hazard by tenure week: h(w) = users last seen
    exactly w weeks after their first activity (with enough
    subsequent observation time to call it churn, not censoring)
    over users still at risk at week w — the DERIVATIVE view of the
    survival family (``stats_km_log_survival`` integrates survival;
    ``events_retention_decay_fit`` fits its envelope; the hazard
    curve is where "week-2 cliff" product decisions are read off).

    The censoring rule is the observable-triangle discipline the
    retention fit uses: a user only counts as churned at w if their
    first-activity cohort is old enough (age > w) to have shown a
    later event. One user-level min/max aggregate; the per-week
    counts are a 13-row broadcast non-equi probe of the user table
    (conditional partial aggregation, no sort); hazards are exact
    half-up ratios.
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    u = t.events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("first_w"),
        F.date_trunc("week", F.max("ts")).alias("last_w"),
    )
    mx = t.events.agg(F.date_trunc("week", F.max("ts")).alias("max_w"))
    ua = u.crossJoin(F.broadcast(mx)).select(
        (F.datediff(F.col("last_w"), F.col("first_w")) / 7).cast("long").alias(
            "tenure"
        ),
        (F.datediff(F.col("max_w"), F.col("first_w")) / 7).cast("long").alias("age"),
    )
    ws = spark.range(HAZARD_MAX_W + 1).select(F.col("id").alias("w"))
    cells = (
        ua.crossJoin(F.broadcast(ws))
        .groupBy("w")
        .agg(
            F.sum(
                F.when((F.col("age") >= F.col("w")) & (F.col("tenure") >= F.col("w")), 1)
                .otherwise(0)
            ).alias("at_risk"),
            F.sum(
                F.when((F.col("tenure") == F.col("w")) & (F.col("age") > F.col("w")), 1)
                .otherwise(0)
            ).alias("churned"),
        )
    )
    return cells.select(
        "w",
        "at_risk",
        "churned",
        F.when(
            F.col("at_risk") > 0,
            round_int_ratio(F.col("churned"), F.col("at_risk")),
        ).alias("hazard"),
    )


# ---------------------------------------------------------------------------
# 4. Benford second-digit forensic audit of order totals
# ---------------------------------------------------------------------------

# P(second digit = d) = sum_{k=1..9} log10(1 + 1/(10k + d)); double
# literals generated once and spliced into BOTH engines verbatim.
BENFORD2_P = tuple(
    sum(math.log10(1.0 + 1.0 / (10 * k + d)) for k in range(1, 10)) for d in range(10)
)


def _benford2_oracle() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {BENFORD2_P[d]!r}::DOUBLE" for d in range(10)
    )
    return f"""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE floor(o_totalprice * 100 + 0.5) >= 10
    ), d2 AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 2, 1) AS BIGINT) AS digit FROM v
    ), obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM d2 GROUP BY digit
    ), dom AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS digit),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d2),
    cells AS (
      SELECT dom.digit, coalesce(obs.observed, 0) AS observed,
             CASE dom.digit {cases} END AS p
      FROM dom LEFT JOIN obs USING (digit)
    )
    SELECT c.digit, c.observed,
           CAST(floor(CAST(nn.n AS DOUBLE) * c.p * 1000000.0 + 0.5) AS BIGINT)
             AS expected_u,
           CAST(floor((CAST(c.observed AS DOUBLE) - CAST(nn.n AS DOUBLE) * c.p)
                      * (CAST(c.observed AS DOUBLE) - CAST(nn.n AS DOUBLE) * c.p)
                      / (CAST(nn.n AS DOUBLE) * c.p) * 1000000.0 + 0.5) AS BIGINT)
             / 1000000.0 AS chi2_contrib
    FROM cells c, nn ORDER BY c.digit
    """


@_queued("dq_benford_second_digit_totals", oracle=_benford2_oracle())
def dq_benford_second_digit_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit audit of order totals: observed vs
    expected distribution of the second significant digit of the
    cent amount, with each digit's chi-square contribution — the
    standard forensic-accounting escalation of the first-digit test
    (``dq_benford_order_totals``): fabricated or rounded amounts
    distort the second digit long after the first digit looks clean
    (psychological round-number pricing shows up as mass on 0/5).

    The second significant digit of a positive integer is character
    two of its decimal rendering — identical string semantics in both
    engines, no float log extraction. The ten Benford probabilities
    are module-level double literals spliced verbatim into both
    sides; each digit's chi-square contribution quantizes half-up
    1e-6 BEFORE any cross-row summation, so no float aggregation
    order exists anywhere. One scan to a 10-row grid.
    """
    t = Tables(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    v = t.orders.select(cents.alias("cents")).filter(F.col("cents") >= 10)
    d2 = v.select(F.substring(F.col("cents").cast("string"), 2, 1).cast("long").alias("digit"))
    obs = d2.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    dom = spark.range(10).select(F.col("id").alias("digit"))
    nn = d2.agg(F.count(F.lit(1)).alias("n"))
    p = None
    for d in range(10):
        p = (
            F.when(F.col("digit") == d, F.lit(BENFORD2_P[d]))
            if p is None
            else p.when(F.col("digit") == d, F.lit(BENFORD2_P[d]))
        )
    cells = (
        dom.join(obs, "digit", "left")
        .select("digit", F.coalesce(F.col("observed"), F.lit(0)).alias("observed"))
        .crossJoin(F.broadcast(nn))
        .select("digit", "observed", "n", p.alias("p"))
    )
    dev = F.col("observed").cast("double") - F.col("n").cast("double") * F.col("p")
    return cells.select(
        "digit",
        "observed",
        F.floor(F.col("n").cast("double") * F.col("p") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("expected_u"),
        (
            F.floor(
                dev * dev / (F.col("n").cast("double") * F.col("p")) * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("long")
            / F.lit(1e6)
        ).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# 5. Binary payload dedup manifest (multimodal blob-store planning)
# ---------------------------------------------------------------------------

PAYLOAD_DEDUP_TOPK = 20


def _payload_dedup_oracle() -> str:
    return f"""
    WITH p AS (
      SELECT sha256(text) AS payload_sha,
             CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
      FROM documents
    ), g AS (
      SELECT payload_sha,
             CAST(count(*) AS BIGINT) AS n_copies,
             CAST(max(payload_bytes) AS BIGINT) AS payload_bytes
      FROM p GROUP BY payload_sha
    )
    SELECT payload_sha, n_copies, payload_bytes,
           (n_copies - 1) * payload_bytes AS bytes_saved
    FROM g WHERE n_copies >= 2
    ORDER BY bytes_saved DESC, payload_sha LIMIT {PAYLOAD_DEDUP_TOPK}
    """


@_queued("multimodal_payload_dedup_manifest", oracle=_payload_dedup_oracle())
def multimodal_payload_dedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dedup manifest for opaque binary payloads:
    group payloads by content hash, surface the duplicate groups that
    save the most bytes if stored once — the blob-store planning step
    of the multimodal family (image/audio corpora routinely carry
    30%+ byte-identical duplicates; a content-addressed store needs
    exactly this manifest). Payload = encode(text) like the other
    multimodal ops (the fixture has no binary column; the SHAPE —
    hash over bytes, group, size accounting — is what matters).

    The hash-groupBy is the exact-dedup kernel (``dedup_exact_text``)
    with byte accounting instead of survivorship; top-k is a
    TakeOrderedAndProject over the duplicate groups (bounded by the
    answer, tie-broken on the hash). The binary column itself never
    shuffles — only its 64-hex digest and length do.
    """
    t = Tables(spark, sf_dir)
    p = t.documents.select(
        F.sha2(F.col("text"), 256).alias("payload_sha"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias(
            "payload_bytes"
        ),
    )
    g = p.groupBy("payload_sha").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.max("payload_bytes").alias("payload_bytes"),
    )
    return (
        g.filter(F.col("n_copies") >= 2)
        .select(
            "payload_sha",
            "n_copies",
            "payload_bytes",
            ((F.col("n_copies") - 1) * F.col("payload_bytes")).alias("bytes_saved"),
        )
        .orderBy(F.col("bytes_saved").desc(), "payload_sha")
        .limit(PAYLOAD_DEDUP_TOPK)
    )


# ---------------------------------------------------------------------------
# 6. Gamma fit of shipment latency (method of moments)
# ---------------------------------------------------------------------------


def _gamma_oracle() -> str:
    return """
    WITH lat AS (
      SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS v
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE date_diff('day', o.o_orderdate, l.l_shipdate) >= 1
    ), a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS HUGEINT) AS s,
             CAST(sum(v::HUGEINT * v) AS HUGEINT) AS q
      FROM lat
    )
    SELECT n,
           CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
                AS BIGINT) / 1000000.0 AS mean_days,
           CAST(floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      / ((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0::DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS gamma_shape,
           CAST(floor(((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0::DOUBLE)))
                      / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS gamma_scale
    FROM a WHERE n >= 2
    """


@_queued("stats_gamma_latency_fit_moments", oracle=_gamma_oracle())
def stats_gamma_latency_fit_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma(shape k, scale theta) method-of-moments fit of
    order-to-ship latency: k = mean^2/var, theta = var/mean — the
    sum-of-exponential-stages read of the logistics pipeline (k ~= 2
    says two queueing stages; Weibull's wear-in story and Gamma's
    stage story bracket the same latency body, which is why
    reliability toolboxes fit both — completing the
    Weibull/NegBin/Gumbel distribution-fitting family).

    One join-scan accumulates exact (n, sum, sum-of-squares) in
    decimal; shape and scale evaluate in double from those exact
    integers with identical association order in both engines,
    quantized half-up 1e-6. Sample variance (n-1) throughout.
    """
    t = Tables(spark, sf_dir)
    lat = (
        t.lineitem.join(
            t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey
        )
        .select(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("v"))
        .filter(F.col("v") >= 1)
    )
    a = lat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("v"))).alias("s"),
        F.sum(_dec(F.col("v")) * F.col("v")).alias("q"),
    ).filter(F.col("n") >= 2)
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (nd * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double")) / (
        nd * (nd - F.lit(1.0))
    )

    def q6(c):
        return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long") / F.lit(1e6)

    return a.select(
        "n",
        q6(mean).alias("mean_days"),
        q6(mean * mean / var).alias("gamma_shape"),
        q6(var / mean).alias("gamma_scale"),
    )
