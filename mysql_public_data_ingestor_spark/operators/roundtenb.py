"""Round-9 banked operator queue, batch B — ACTIVATED in round 10.

Round 9's driver window closed at 48/50 (the activated round-8 queue
+ 25 direct registrations), so this batch was banked UNGATED at the
end of round 9 (the round-9 snapshot wrongly claimed its gates
existed — VERDICT r9 item 1). Round 10 made the claim true before
flipping activation: raw-frame oracle parity + plan sweeps + Python
replicas in ``tests/test_roundtenb.py``, fuzz profiles / sf0.1 / x10
recorded in SCALE.md §5i, and ``registry._ensure_loaded`` now calls
``roundtenb.activate()`` — all in the same commit as the gates.

Batch theme: concordance effect size (Kendall's W over the Friedman
rank table), product session-duration distribution, a code-detection
corpus gate, cost-sensitive threshold selection, the AMS F2 moment
sketch with exact audit, and a weekday-adjusted volume anomaly
monitor with EXACT integer flagging.
"""

from __future__ import annotations

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
# 1. Kendall's W concordance over the nation x priority rank table
# ---------------------------------------------------------------------------


def _kendall_w_oracle() -> str:
    from ..functions.exact import sql_round_big_int_ratio

    return f"""
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
      SELECT c.trt,
             CAST(row_number() OVER (PARTITION BY c.blk
                  ORDER BY CAST(c.s_cell AS DOUBLE) / c.n_cell, c.trt)
                  AS BIGINT) AS rnk
      FROM cells c JOIN complete b USING (blk)
    ), rj AS (
      SELECT trt, CAST(sum(rnk) AS BIGINT) AS r_j FROM ranked GROUP BY trt
    ), bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM complete),
    s AS (
      SELECT kk.k, bb.b,
             CAST(sum((2::HUGEINT * r_j - bb.b::HUGEINT * (kk.k + 1))
                      * (2::HUGEINT * r_j - bb.b::HUGEINT * (kk.k + 1)))
                  AS HUGEINT) AS s4
      FROM rj, kk, bb GROUP BY kk.k, bb.b
    )
    SELECT k, b AS n_blocks, CAST(s4 AS BIGINT) AS s4,
           CASE WHEN b > 0 AND k > 1 THEN
             {sql_round_big_int_ratio(
                 '3::HUGEINT * s4',
                 'b::HUGEINT * b * k * (k * k - 1)')}
           END AS kendall_w
    FROM s
    """


@_queued("stats_kendall_w_nation_priority", oracle=_kendall_w_oracle())
def stats_kendall_w_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W over the same
    nation-blocked priority rank table Friedman and Page use: W =
    12 sum_j (R_j - b(k+1)/2)^2 / (b^2 k (k^2-1)) — the EFFECT SIZE
    for the blocked rank design (Friedman answers "is there an
    effect", Page "is it ordered", W "how strong is the agreement
    across blocks", the Friedman statistic's chi-square scaled to
    [0,1]).

    With the deterministic total-order ranking (no ties by
    construction) W is ONE exact big-integer ratio: S4 = sum (2R_j -
    b(k+1))^2 makes 12*S = 3*S4, so kendall_w =
    3*S4 / (b^2 k (k^2-1)) with zero floats anywhere. Same
    |nations| x |priorities| bounded rank table off one
    partial-aggregated join.
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
    w = Window.partitionBy("blk").orderBy(
        F.col("s_cell").cast("double") / F.col("n_cell"), F.col("trt")
    )
    ranked = cells.join(complete, "blk").select(
        "trt", F.row_number().over(w).cast("long").alias("rnk")
    )
    rj = ranked.groupBy("trt").agg(F.sum("rnk").alias("r_j"))
    b = complete.agg(F.count(F.lit(1)).alias("b"))
    kb = kk.crossJoin(F.broadcast(b))
    dev = F.lit(2).cast("decimal(38,0)") * F.col("r_j") - _dec(F.col("b")) * (
        F.col("k") + 1
    )
    s = rj.crossJoin(F.broadcast(kb)).agg(
        F.max("k").alias("k"),
        F.max("b").alias("b"),
        F.sum(dev * dev).alias("s4"),
    )
    den = (
        _dec(F.col("b"))
        * F.col("b")
        * F.col("k")
        * (F.col("k") * F.col("k") - 1)
    )
    return s.select(
        "k",
        F.col("b").alias("n_blocks"),
        F.col("s4").cast("long").alias("s4"),
        F.when(
            (F.col("b") > 0) & (F.col("k") > 1),
            round_big_int_ratio(F.lit(3).cast("decimal(38,0)") * F.col("s4"), den),
        ).alias("kendall_w"),
    )


# ---------------------------------------------------------------------------
# 2. Session duration distribution (fixed minute buckets)
# ---------------------------------------------------------------------------

SESSDUR_EDGES = (1, 5, 15, 30, 60)  # minutes; bucket 0 = [0,1), last = 60+


def _sessdur_bucket_sql(col: str) -> str:
    cases = []
    lo = 0
    for i, hi in enumerate(SESSDUR_EDGES):
        cases.append(f"WHEN {col} < {hi} THEN {i}")
        lo = hi
    return "CASE " + " ".join(cases) + f" ELSE {len(SESSDUR_EDGES)} END"


def _sessdur_oracle() -> str:
    from ..streaming.batch_equivalents import SESSION_GAP_MIN
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {SESSION_GAP_MIN} * 60000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
             ts
      FROM flagged
    ), per AS (
      SELECT (epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000 AS dur_min
      FROM sessions GROUP BY user_id, session_id
    ), bucketed AS (
      SELECT CAST({_sessdur_bucket_sql('dur_min')} AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_sessions
      FROM per GROUP BY 1
    ), tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS t FROM bucketed)
    SELECT b.bucket, b.n_sessions,
           {sql_round_int_ratio('b.n_sessions', 't.t')} AS share
    FROM bucketed b, tot t ORDER BY b.bucket
    """


@_queued("events_session_duration_histogram", oracle=_sessdur_oracle())
def events_session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session duration distribution over fixed minute buckets
    ([0,1), [1,5), [5,15), [15,30), [30,60), 60+): the engagement
    SHAPE metric the sessionization family was missing —
    ``events_sessionization`` enumerates sessions, DAU/MAU counts
    them; product teams read duration MIX (bounce share vs long-tail
    share) off exactly this histogram.

    Same one-shuffle lag/cumsum sessionization kernel; durations are
    exact integer minute floors of microsecond spans, buckets are a
    literal CASE ladder (no percentile pass), shares exact half-up
    ratios. Output is <= 6 rows regardless of scale.
    """
    from ..streaming.batch_equivalents import SESSION_GAP_MIN
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    flagged = t.events.select("user_id", "ts", "event_id").withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60_000_000), 1).otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(cum))
    per = sessions.groupBy("user_id", "session_id").agg(
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 60000000").alias(
            "dur_min"
        )
    )
    bucket = F.when(F.col("dur_min") < SESSDUR_EDGES[0], 0)
    for i, hi in enumerate(SESSDUR_EDGES[1:], start=1):
        bucket = bucket.when(F.col("dur_min") < hi, i)
    bucket = bucket.otherwise(len(SESSDUR_EDGES)).cast("long")
    bucketed = per.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    tot = bucketed.agg(F.sum("n_sessions").alias("t"))
    return bucketed.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_sessions",
        round_int_ratio(F.col("n_sessions"), F.col("t")).alias("share"),
    )


# ---------------------------------------------------------------------------
# 3. Code-detection heuristic gate per language
# ---------------------------------------------------------------------------

CODE_SYMBOLS = "{};<>="
CODE_PCT_X20 = 1  # code-like iff 20 * n_sym > n_chars (> 5% symbol density)


def _code_detect_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    return f"""
    WITH d AS (
      SELECT lang,
             CAST(n_chars AS BIGINT) AS n_chars,
             CAST(length(text) - length(translate(text, '{CODE_SYMBOLS}', ''))
               AS BIGINT) AS n_sym
      FROM documents
    ), per AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN n_chars > 0 AND 20 * n_sym > n_chars
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_code_like,
             CAST(sum(n_sym) AS BIGINT) AS total_symbols
      FROM d GROUP BY lang
    )
    SELECT lang, n_docs, n_code_like, total_symbols,
           {sql_round_int_ratio('n_code_like', 'n_docs')} AS code_share
    FROM per ORDER BY lang
    """


@_queued("text_code_detection_gate", oracle=_code_detect_oracle())
def text_code_detection_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-detection heuristic per language: flag documents whose
    structural-symbol density ({{}};<>=) exceeds 5% of characters —
    the classic cheap code-vs-prose separator a natural-language
    corpus pipeline runs BEFORE the quality gates (code in a prose
    corpus poisons both the LM filter and dedup shingles; prose in a
    code corpus is the symmetric problem), completing the filter
    family beside language ID, Gopher gates, and the classifier.

    The symbol count is character arithmetic (length minus
    translate-stripped length — identical semantics both engines, no
    regex engine in the loop) and the 5% test is the exact integer
    comparison 20*n_sym > n_chars, so no float threshold exists. One
    scan to |langs| rows.
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    n_sym = (
        F.length("text") - F.length(F.translate(F.col("text"), CODE_SYMBOLS, ""))
    ).cast("long")
    d = t.documents.select(
        "lang", F.col("n_chars").cast("long").alias("n_chars"), n_sym.alias("n_sym")
    )
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when((F.col("n_chars") > 0) & (20 * F.col("n_sym") > F.col("n_chars")), 1)
            .otherwise(0)
        ).alias("n_code_like"),
        F.sum("n_sym").alias("total_symbols"),
    )
    return per.select(
        "lang",
        "n_docs",
        "n_code_like",
        "total_symbols",
        round_int_ratio(F.col("n_code_like"), F.col("n_docs")).alias("code_share"),
    )


# ---------------------------------------------------------------------------
# 4. Cost-sensitive optimal threshold (expected-cost minimizer)
# ---------------------------------------------------------------------------

COST_FP = 1
COST_FN = 5


def _cost_threshold_oracle() -> str:
    from .ml import _scored_labeled_sql

    return (
        _scored_labeled_sql()
        + f"""
    , grid AS (
      SELECT score_q,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(label) AS BIGINT) AS cpos
      FROM scored GROUP BY score_q
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(cpos) AS BIGINT) AS pos
      FROM grid
    ), cum AS (
      SELECT score_q,
             sum(cnt) OVER (ORDER BY score_q DESC) AS pred_pos,
             sum(cpos) OVER (ORDER BY score_q DESC) AS tp
      FROM grid
    ), costs AS (
      SELECT c.score_q AS threshold,
             CAST(c.tp AS BIGINT) AS tp,
             CAST(c.pred_pos - c.tp AS BIGINT) AS fp,
             CAST(t.pos - c.tp AS BIGINT) AS fn,
             CAST(t.n - c.pred_pos - (t.pos - c.tp) AS BIGINT) AS tn,
             CAST({COST_FP} * (c.pred_pos - c.tp)
                  + {COST_FN} * (t.pos - c.tp) AS BIGINT) AS cost
      FROM cum c, tot t
    )
    SELECT threshold, tp, fp, fn, tn, cost
    FROM costs ORDER BY cost, threshold LIMIT 1
    """
    )


@_queued("ml_cost_optimal_threshold", oracle=_cost_threshold_oracle())
def ml_cost_optimal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive operating point: the score threshold minimizing
    expected cost C_FP*FP + C_FN*FN (false negatives 5x false
    positives — the asymmetric regime of a KEEP/DROP corpus gate,
    where discarding a good document costs more than keeping a bad
    one) — the decision-theoretic selector beside the symmetric
    Youden J (``ml_youden_optimal_threshold``): same ROC cumulative,
    different objective, and the two chosen thresholds differ exactly
    when the cost ratio says they should.

    Confusion counts come from one descending cumulative over the
    <= 10001-value score grid (bounded domain, same class as Youden);
    cost is exact integer arithmetic with literal weights; the argmin
    is a TakeOrdered(1) with the threshold as total-order tiebreak.
    """
    from .ml import _scored_labeled

    t = Tables(spark, sf_dir)
    sc = _scored_labeled(t)
    grid = sc.groupBy("score_q").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("label").alias("cpos")
    )
    tot = grid.agg(F.sum("cnt").alias("n"), F.sum("cpos").alias("pos"))
    w_desc = Window.orderBy(F.col("score_q").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        "score_q",
        F.sum("cnt").over(w_desc).alias("pred_pos"),
        F.sum("cpos").over(w_desc).alias("tp"),
    )
    costs = cum.crossJoin(F.broadcast(tot)).select(
        F.col("score_q").alias("threshold"),
        F.col("tp"),
        (F.col("pred_pos") - F.col("tp")).alias("fp"),
        (F.col("pos") - F.col("tp")).alias("fn"),
        (F.col("n") - F.col("pred_pos") - (F.col("pos") - F.col("tp"))).alias("tn"),
        (
            F.lit(COST_FP) * (F.col("pred_pos") - F.col("tp"))
            + F.lit(COST_FN) * (F.col("pos") - F.col("tp"))
        ).alias("cost"),
    )
    return costs.orderBy("cost", "threshold").limit(1)


# ---------------------------------------------------------------------------
# 5. AMS F2 (second frequency moment) sketch with exact audit
# ---------------------------------------------------------------------------

AMS_ESTIMATORS = 16


def _ams_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    j = AMS_ESTIMATORS
    return f"""
    WITH freq AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ), exact AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM freq
    ), signs AS (
      SELECT f.c, j.j,
             2 * ((('0x' || substr(sha256('ams' || CAST(j.j AS VARCHAR) || '|'
                    || CAST(f.user_id AS VARCHAR)), 1, 15)))::BIGINT % 2) - 1
               AS s
      FROM freq f, (SELECT unnest(range(0, {j})) AS j) j
    ), xs AS (
      SELECT j, CAST(sum(s * c) AS BIGINT) AS x FROM signs GROUP BY j
    ), ests AS (
      SELECT list_sort(list(x * x)) AS arr FROM xs
    ), med AS (
      SELECT CAST((arr[{j // 2}] + arr[{j // 2 + 1}]) // 2 AS BIGINT) AS f2_ams
      FROM ests
    )
    SELECT CAST({j} AS BIGINT) AS n_estimators, e.f2_exact, m.f2_ams,
           CASE WHEN e.f2_exact > 0 THEN
             {sql_round_int_ratio('abs(m.f2_ams - e.f2_exact)', 'e.f2_exact')}
           END AS rel_error
    FROM exact e, med m
    """


@_queued("sketch_ams_f2_users", oracle=_ams_oracle())
def sketch_ams_f2_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) sketch of the second frequency
    moment F2 = sum_u count(u)^2 of per-user event counts — THE
    self-join-size / skew estimator (F2 is exactly the output size of
    a user-keyed self-join, what a cost-based optimizer wants before
    picking a join strategy), completing the sketch family's moment
    corner beside the cardinality (F0: KMV/linear counting/bitmap)
    and heavy-hitter (CountMin) members. Reported beside the exact F2
    with relative error like every sketch audit in the registry.

    Sixteen +-1 estimators from the portable salted sha parity; each
    X_j = sum s_j(u)*c_u is one exact int64 aggregate over a
    16-way-replicated user-frequency table (the replication is of the
    AGGREGATED per-user counts, not raw events), and the median of
    the 16 X_j^2 comes from a sorted 16-element array in a single-row
    aggregate — no window, no driver loop. Estimator state is 16
    integers: mergeable by addition across any partitioning.
    """
    from ..functions.exact import round_int_ratio
    from ..functions.textnorm import sha256_prefix_i64

    jn = AMS_ESTIMATORS
    t = Tables(spark, sf_dir)
    freq = t.events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    exact = freq.agg(F.sum(F.col("c") * F.col("c")).alias("f2_exact"))
    js = spark.range(jn).select(F.col("id").alias("j"))
    sign = (
        2
        * (
            sha256_prefix_i64(
                F.concat(
                    F.lit("ams"),
                    F.col("j").cast("string"),
                    F.lit("|"),
                    F.col("user_id").cast("string"),
                )
            )
            % 2
        )
        - 1
    )
    xs = (
        freq.crossJoin(F.broadcast(js))
        .select("j", (sign * F.col("c")).alias("sc"))
        .groupBy("j")
        .agg(F.sum("sc").alias("x"))
    )
    med = xs.agg(
        F.sort_array(F.collect_list(F.col("x") * F.col("x"))).alias("arr")
    ).select(
        F.expr(f"(arr[{jn // 2 - 1}] + arr[{jn // 2}]) div 2").alias("f2_ams")
    )
    out = med.crossJoin(F.broadcast(exact))
    return out.select(
        F.lit(jn).cast("long").alias("n_estimators"),
        "f2_exact",
        "f2_ams",
        F.when(
            F.col("f2_exact") > 0,
            round_int_ratio(
                F.abs(F.col("f2_ams") - F.col("f2_exact")), F.col("f2_exact")
            ),
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# 6. Weekday-adjusted order-volume anomaly monitor (exact flagging)
# ---------------------------------------------------------------------------

ANOM_K_SIGMA = 3


def _weekday_anomaly_oracle() -> str:
    k = ANOM_K_SIGMA
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), wd AS (
      SELECT day, x, CAST(dayofweek(day) AS BIGINT) AS weekday FROM daily
    ), per AS (
      SELECT weekday,
             CAST(count(*) AS BIGINT) AS n_w,
             CAST(sum(x) AS HUGEINT) AS s_w,
             CAST(sum(x::HUGEINT * x) AS HUGEINT) AS q_w
      FROM wd GROUP BY weekday
    ), flagged AS (
      SELECT w.weekday, p.n_w,
             CASE WHEN p.n_w >= 2
                       AND (p.n_w::HUGEINT * w.x - p.s_w)
                           * (p.n_w::HUGEINT * w.x - p.s_w)
                           * (p.n_w - 1)
                           >= {k * k}::HUGEINT * p.n_w
                             * (p.n_w::HUGEINT * p.q_w - p.s_w * p.s_w)
                  THEN 1 ELSE 0 END AS is_anom
      FROM wd w JOIN per p USING (weekday)
    )
    SELECT weekday, CAST(max(n_w) AS BIGINT) AS n_days,
           CAST(sum(is_anom) AS BIGINT) AS n_anomalies
    FROM flagged GROUP BY weekday ORDER BY weekday
    """


@_queued("dq_weekday_volume_anomaly", oracle=_weekday_anomaly_oracle())
def dq_weekday_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-adjusted order-volume anomaly monitor: a day is
    anomalous when its count deviates >= 3 sigma from ITS OWN
    WEEKDAY's mean — the seasonality-aware volume check
    (``events_seasonal_hourly_baseline`` does this for hours of the
    final day; this audits the WHOLE order history with weekly
    seasonality removed, the shape a data-quality volume monitor
    actually ships: Sunday dips are normal, a Sunday spike is not).

    The 3-sigma test is EXACT integer arithmetic — |x - mean_w| >=
    3*sd_w cross-multiplies to (n*x - S)^2 (n-1) >= 9 n (nQ - S^2),
    so no sqrt, no float, no boundary flake can move a flag
    cross-engine. One day-level aggregate, one 7-row weekday profile
    broadcast back over the day series.

    Weekday convention: DuckDB's dayofweek (0=Sunday..6=Saturday) =
    Spark's dayofweek - 1.
    """
    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    wd = daily.select(
        "day", "x", (F.dayofweek("day") - 1).cast("long").alias("weekday")
    )
    per = wd.groupBy("weekday").agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum(_dec(F.col("x"))).alias("s_w"),
        F.sum(_dec(F.col("x")) * F.col("x")).alias("q_w"),
    )
    j = wd.join(F.broadcast(per), "weekday")
    dev = _dec(F.col("n_w")) * F.col("x") - F.col("s_w")
    lhs = dev * dev * (F.col("n_w") - 1)
    rhs = (
        F.lit(ANOM_K_SIGMA * ANOM_K_SIGMA).cast("decimal(38,0)")
        * F.col("n_w")
        * (_dec(F.col("n_w")) * F.col("q_w") - F.col("s_w") * F.col("s_w"))
    )
    flagged = j.select(
        "weekday",
        "n_w",
        F.when((F.col("n_w") >= 2) & (lhs >= rhs), 1).otherwise(0).alias("is_anom"),
    )
    return flagged.groupBy("weekday").agg(
        F.max("n_w").alias("n_days"), F.sum("is_anom").alias("n_anomalies")
    )
