"""Round-6 operator batch, part 2.

Continues the round-6 surface after ``roundsix.py``: market-structure
and dispersion statistics, data-quality profiling, lexical-diversity
text analysis, and model-quality metrics over the shared classifier
scan — every operator oracle-paired and built on the exactness
toolkit (``functions/exact.py`` integer half-up ratios,
``functions/detmath.py`` deterministic ln where the semantics are
logarithmic).

Reference parity note: the reference (an ingestion pipeline,
`/root/reference/main.go`) has no analytics surface — these operators
extend the driver-mandated engine families (SURVEY.md §2.C: warehouse
statistics, DQ, text analysis, model metrics) with the standard
published formulations (HHI: Herfindahl 1950; Cramér's V: Cramér 1946;
burstiness B=(σ−μ)/(σ+μ): Goh & Barabási 2008).
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
# 1. Herfindahl-Hirschman supplier concentration by nation
# ---------------------------------------------------------------------------


def _hhi_oracle() -> str:
    return """
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                                 + 0.5) AS BIGINT)) AS HUGEINT) AS cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ), agg AS (
      SELECT s_nationkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             sum(cents * cents) AS sq,
             sum(cents) AS tot
      FROM rev GROUP BY 1
    )
    SELECT n.n_name AS nation, n_suppliers,
           CAST(((2000000::HUGEINT * sq + tot * tot)
                 // (2::HUGEINT * tot * tot)) AS BIGINT) / 1000000.0 AS hhi
    FROM agg JOIN nation n ON n.n_nationkey = agg.s_nationkey
    ORDER BY nation
    """


@register("stats_hhi_supplier_concentration", oracle=_hhi_oracle())
def stats_hhi_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration
    within each supplier nation — the market-structure statistic
    (HHI = sum of squared revenue shares; 1/n = perfect competition,
    1 = monopoly).

    Exactness: revenue quantizes to cents (int64 per row, exact sum),
    then HHI = sum(s_i^2) / S^2 entirely in decimal(38,0) — cents-sums
    at 100 TB square to ~1e26, far past int64, so this is the
    round_big_int_ratio discipline applied to a sum-of-squares
    numerator (ADVICE r5 overflow class).

    Scale: one partial-aggregated fact groupBy on (nationkey, suppkey)
    after a broadcast join to supplier; the squaring reduce is
    |suppliers| rows, the output |nations|.
    """
    from ..functions.exact import quantize, round_big_int_ratio

    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            t.lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                quantize(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
                )
            ).alias("cents")
        )
    )
    agg = rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(_dec(F.col("cents")) * _dec(F.col("cents"))).alias("sq"),
        F.sum(_dec(F.col("cents"))).alias("tot"),
    )
    return (
        agg.join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            agg.s_nationkey == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            round_big_int_ratio(
                F.col("sq"), _dec(F.col("tot")) * _dec(F.col("tot"))
            ).alias("hhi"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# 2. Cramér's V association: order priority x order status
# ---------------------------------------------------------------------------


def _cramers_oracle() -> str:
    return """
    WITH cell AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(o) AS HUGEINT) AS n,
             CAST(count(DISTINCT pri) AS BIGINT) AS k_r,
             CAST(count(DISTINCT st) AS BIGINT) AS k_c
      FROM cell
    ), margins AS (
      SELECT c.pri, c.st, c.o,
             CAST(sum(c.o) OVER (PARTITION BY c.pri) AS HUGEINT) AS r,
             CAST(sum(c.o) OVER (PARTITION BY c.st) AS HUGEINT) AS cc
      FROM cell c
    ), terms AS (
      SELECT m.pri, m.st,
             ((2000000000::HUGEINT
               * ((m.o * t.n - m.r * m.cc) * (m.o * t.n - m.r * m.cc))
               + (t.n * m.r * m.cc))
              // (2::HUGEINT * t.n * m.r * m.cc)) AS term_q
      FROM margins m CROSS JOIN tot t
    ), chi AS (
      SELECT CAST(sum(term_q) AS BIGINT) AS chi2_q FROM terms
    )
    SELECT CAST(t.n AS BIGINT) AS n_orders,
           CAST(t.k_r AS BIGINT) AS k_priorities,
           CAST(t.k_c AS BIGINT) AS k_statuses,
           chi2_q / 1000000000.0 AS chi2,
           CAST(floor(sqrt((chi2_q / 1000000000.0)
                           / (CAST(t.n AS DOUBLE)
                              * CAST(least(t.k_r, t.k_c) - 1 AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS cramers_v
    FROM chi CROSS JOIN tot t
    """


@register("stats_cramers_v_priority_status", oracle=_cramers_oracle())
def stats_cramers_v_priority_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cramér's V association between order priority and order status
    — the [0,1]-normalized chi-square for two categoricals (the
    chi-square statistic itself grows with N; V is comparable across
    fixture scales).

    Exactness: chi2 = sum over cells of (o*N - r*c)^2 / (N*r*c); each
    cell term is quantized half-up at 1e-9 in decimal(38,0) (the
    squared numerator reaches ~(N^2)^2 ~ 1e40 at 100 TB in raw form —
    here products stay under 38 digits because o,r,c <= N and terms
    divide through before summing), and the integer term sum is exact.
    The final sqrt runs on a bit-identical double on both engines
    (exact int / power-of-ten literal, one correctly-rounded divide
    and sqrt).

    Scale: one groupBy over the 15-cell contingency; margins via
    windows over 15 rows; single-row output (final-aggregate
    SinglePartition, sanctioned).
    """
    t = Tables(spark, sf_dir)
    cell = t.orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).alias("o"))
    tot = cell.agg(
        F.sum("o").alias("n"),
        F.countDistinct("pri").alias("k_r"),
        F.countDistinct("st").alias("k_c"),
    )
    m = cell.select(
        "pri",
        "st",
        "o",
        F.sum("o").over(Window.partitionBy("pri")).alias("r"),
        F.sum("o").over(Window.partitionBy("st")).alias("cc"),
    )
    j = m.crossJoin(F.broadcast(tot))
    num = _dec(F.col("o")) * _dec(F.col("n")) - _dec(F.col("r")) * _dec(
        F.col("cc")
    )
    den = _dec(F.col("n")) * _dec(F.col("r")) * _dec(F.col("cc"))
    a = F.lit(2_000_000_000).cast("decimal(38,0)") * num * num + den
    b = F.lit(2).cast("decimal(38,0)") * den
    terms = j.select(
        "n",
        "k_r",
        "k_c",
        ((a - a % b) / b).cast("long").alias("term_q"),
    )
    chi = terms.groupBy("n", "k_r", "k_c").agg(
        F.sum("term_q").alias("chi2_q")
    )
    chi2 = F.col("chi2_q") / F.lit(1_000_000_000.0)
    v = F.sqrt(
        chi2
        / (
            F.col("n").cast("double")
            * (F.least("k_r", "k_c") - F.lit(1)).cast("double")
        )
    )
    return chi.select(
        F.col("n").alias("n_orders"),
        F.col("k_r").alias("k_priorities"),
        F.col("k_c").alias("k_statuses"),
        chi2.alias("chi2"),
        (F.floor(v * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
         / F.lit(1_000_000.0)).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# 3. Variance-to-mean overdispersion of daily event counts
# ---------------------------------------------------------------------------


def _vmr_oracle() -> str:
    return """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), agg AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(c) AS HUGEINT) AS s,
             CAST(sum(c * c) AS HUGEINT) AS q
      FROM daily GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS n_events,
           CAST(((2000000::HUGEINT * s + n) // (2::HUGEINT * n)) AS BIGINT)
             / 1000000.0 AS mean_daily,
           CAST(((2000000::HUGEINT * (n * q - s * s) + (n * s))
                 // (2::HUGEINT * n * s)) AS BIGINT) / 1000000.0 AS vmr
    FROM agg
    ORDER BY event_type
    """


@register("stats_overdispersion_vmr", oracle=_vmr_oracle())
def stats_overdispersion_vmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio (index of dispersion) of daily event
    counts per event type — the standard Poisson-ness check (VMR = 1
    under Poisson; > 1 means bursty/overdispersed arrivals), the
    dispersion companion to ``events_poisson_rate_test``'s rate
    comparison.

    Exactness: population variance / mean collapses to the integer
    ratio (n*sum(c^2) - S^2) / (n*S) — numerator in decimal/HUGEINT
    (day-count squares sum past int64 at large SF), one half-up
    quantization at 1e-6.

    Scale: groupBy (event_type, day) partial-aggregates map-side to
    |types|*|days| rows; the moment reduce is |types| rows.
    """
    from ..functions.exact import round_big_int_ratio

    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(_dec(F.col("c")) * _dec(F.col("c"))).alias("q"),
    )
    n, s, q = _dec(F.col("n")), _dec(F.col("s")), F.col("q")
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("s").alias("n_events"),
        round_big_int_ratio(s, n).alias("mean_daily"),
        round_big_int_ratio(n * q - s * s, n * s).alias("vmr"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# 4. Column completeness / distinctness profile (long format)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("lang", "source", "text")


def _completeness_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_null,
               CAST(sum(CASE WHEN {c} IS NOT NULL AND trim({c}) = ''
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM documents
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register("dq_completeness_profile", oracle=_completeness_oracle())
def dq_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format completeness/distinctness profile of the documents
    string columns — per column: row count, nulls, blank-after-trim,
    distinct values. The table-level profiling sweep a DQ suite runs
    before rule authoring (``dq_column_profile`` is the wide
    numeric-stats twin; this is the string-hygiene census).

    Scale: ONE aggregate pass — the per-column sums and the three
    count(DISTINCT) resolve through a single Expand-based
    multi-distinct aggregate (3x row amplification map-side, keyed
    shuffle), not three table scans; the unpivot to long format happens
    on the 1-row aggregate output via stack().
    """
    t = Tables(spark, sf_dir)
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"{c}__null"
            ),
            F.sum(
                F.when(
                    F.col(c).isNotNull() & (F.trim(F.col(c)) == ""), 1
                ).otherwise(0)
            ).alias(f"{c}__blank"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    wide = t.documents.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__blank, {c}__distinct"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_null, n_blank, n_distinct)"
        )
    ).orderBy("column_name")


# ---------------------------------------------------------------------------
# 5. Type-token ratio and hapax share by language
# ---------------------------------------------------------------------------


def _ttr_oracle() -> str:
    from .corpus import _SQL_TOKENS

    return f"""
    WITH toks AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS token FROM documents
    ), freq AS (
      SELECT lang, token, CAST(count(*) AS BIGINT) AS f
      FROM toks WHERE token <> '' GROUP BY 1, 2
    )
    SELECT lang,
           CAST(sum(f) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ((2000000::BIGINT * count(*) + sum(f)) // (2 * sum(f)))
             / 1000000.0 AS ttr,
           ((2000000::BIGINT * sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
             + count(*)) // (2 * count(*))) / 1000000.0 AS hapax_share
    FROM freq GROUP BY lang
    ORDER BY lang
    """


@register("text_ttr_hapax_by_lang", oracle=_ttr_oracle())
def text_ttr_hapax_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per language: type-token ratio and hapax
    legomenon share — the vocabulary-richness gates a corpus QA pass
    runs next to the Zipf fit (low TTR = boilerplate/templated text;
    high hapax share = OCR noise or tokenizer damage).

    Exactness: pure integer count ratios, half-up at 1e-6
    (round_int_ratio domain — type/token counts stay well under the
    int64 ratio ceiling at any SF since they are per-language counts
    of DISTINCT tokens).

    Scale: the (lang, token) groupBy partial-aggregates the token
    stream map-side; the reduce keys on the bounded vocabulary, and
    the final rollup is |langs| rows. No text leaves the token
    hashing stage — shuffles carry (lang, token, count).
    """
    from ..functions.exact import round_int_ratio
    from ..functions.textnorm import whitespace_tokens

    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "lang",
        F.explode(whitespace_tokens(F.col("text"))).alias("token"),
    ).where(F.col("token") != "")
    freq = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("f"))
    agg = freq.groupBy("lang").agg(
        F.sum("f").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    return agg.select(
        "lang",
        "n_tokens",
        "n_types",
        "n_hapax",
        round_int_ratio(F.col("n_types"), F.col("n_tokens")).alias("ttr"),
        round_int_ratio(F.col("n_hapax"), F.col("n_types")).alias(
            "hapax_share"
        ),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# 6. Inter-arrival burstiness per event type
# ---------------------------------------------------------------------------


def _burstiness_oracle() -> str:
    return """
    WITH ordered AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap
      FROM events
    ), agg AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(gap) AS HUGEINT) AS s,
             CAST(sum(gap::HUGEINT * gap) AS HUGEINT) AS q
      FROM ordered WHERE gap IS NOT NULL GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(((2000000::HUGEINT * s + n) // (2::HUGEINT * n)) AS BIGINT)
             / 1000000.0 AS mean_gap_s,
           CAST(floor((sqrt(CAST(n * q - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
                      / (sqrt(CAST(n * q - s * s AS DOUBLE)) + CAST(s AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS burstiness
    FROM agg
    ORDER BY event_type
    """


@register("events_interarrival_burstiness", oracle=_burstiness_oracle())
def events_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of inter-arrival times
    per event type — B→−1 for clockwork arrivals, 0 for Poisson, →1
    for extreme burst trains; the shape statistic behind rate-limit
    and capacity planning that a plain mean gap hides.

    Exactness: gaps are integer epoch-second diffs; n·Σg²−S² is exact
    in decimal(38,0)/HUGEINT, and B simplifies so the group size n
    cancels: B = (sqrt(nΣg²−S²) − S)/(sqrt(nΣg²−S²) + S). The one
    decimal→double cast is correctly rounded on both engines, and
    sqrt/divide are IEEE-correct single roundings — bit-identical
    before the 1e-6 quantization.

    Scale: the lag window partitions by event_type (parallel across
    types; within a type the ordered pass is the semantics). At 100 TB
    with few giant types, pre-bucket by (type, day) and difference at
    day boundaries — the day-interior gaps dominate the moments.
    """
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = t.events.select(
        "event_type",
        (
            F.unix_timestamp("ts")
            - F.lag(F.unix_timestamp("ts")).over(w)
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("s"),
        F.sum(_dec(F.col("gap")) * _dec(F.col("gap"))).alias("q"),
    )
    from ..functions.exact import round_big_int_ratio

    var_num = (_dec(F.col("n")) * F.col("q")
               - _dec(F.col("s")) * _dec(F.col("s"))).cast("double")
    sd = F.sqrt(var_num)
    s_d = F.col("s").cast("double")
    b = (sd - s_d) / (sd + s_d)
    return agg.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        round_big_int_ratio(_dec(F.col("s")), _dec(F.col("n"))).alias(
            "mean_gap_s"
        ),
        (F.floor(b * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
         / F.lit(1_000_000.0)).alias("burstiness"),
    ).orderBy("event_type")
