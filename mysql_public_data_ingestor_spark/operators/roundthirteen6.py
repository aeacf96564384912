"""Round-13 direct registrations, batch U (categorical PRE measures,
frequency-spectrum lexical statistics, and a MinHash estimator audit).

Five window-slot completions beside the activated bank and batch T,
each oracle-paired, replica-pinned and plan-barred in
``tests/test_roundthirteen6.py`` (same-commit gate rule). Every name
was checked against the full 543-name registry inventory before
design (the SCALE §5j.7 authoring rule):

* ``stats_goodman_kruskal_lambda`` — modal proportional-reduction-in-
  error association (both directions + symmetric), pure integers.
* ``stats_goodman_kruskal_tau`` — the variance-based PRE sibling
  (Goodman-Kruskal tau), exact rational arithmetic.
* ``text_sichel_guiraud_richness`` — Sichel's S (dis-legomena share)
  and Guiraud's R^2 off a shared per-language frequency spectrum.
* ``corpus_good_turing_coverage`` — Good-Turing sample coverage /
  unseen-mass estimate + Chao1 richness floor, same spectrum.
* ``dedup_minhash_estimator_audit`` — MinHash-estimated vs exact
  Jaccard over the blocked candidate pairs, grouped by signature
  agreement (the estimator-quality table behind the LSH thresholds).

Reference parity note: the reference (Go ingestion pipeline,
``/root/reference/main.go``) has no analytics; these extend SURVEY
§2.C warehouse statistics / text analysis / corpus management / dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables
from .roundeleven import _dec, _halfup_div, _sql_halfup_div

# ---------------------------------------------------------------------------
# shared: priority x status contingency grid (two consumers below)
# ---------------------------------------------------------------------------

_SQL_PS_GRID = """
    grid AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y,
             CAST(count(*) AS HUGEINT) AS n
      FROM orders GROUP BY 1, 2
    )
"""


def _ps_grid(t: Tables) -> DataFrame:
    """(x=priority, y=status, n) — the bounded contingency grid both
    PRE measures consume (SQL twin ``_SQL_PS_GRID``). Eagerly
    localCheckpointed: the lambda op branches five grid-sized
    aggregates off it and each would otherwise re-run the fact scan
    (measured 4.3 s -> 1.7 s at sf0.1; the 20-row-grid pinning
    discipline from the PAV decomposition)."""
    return (
        t.orders.groupBy(
            F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
        )
        .agg(_dec(F.count(F.lit(1))).alias("n"))
        .localCheckpoint(eager=True)
    )


# ---------------------------------------------------------------------------
# 1. Goodman-Kruskal lambda (modal PRE)
# ---------------------------------------------------------------------------


def _lambda_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH {_SQL_PS_GRID.strip()}
    , rowmax AS (
      SELECT CAST(sum(mx) AS HUGEINT) AS sum_rowmax FROM (
        SELECT x, max(n) AS mx FROM grid GROUP BY x)
    ), colmax AS (
      SELECT CAST(sum(mx) AS HUGEINT) AS sum_colmax FROM (
        SELECT y, max(n) AS mx FROM grid GROUP BY y)
    ), marg AS (
      SELECT CAST(max(ny) AS HUGEINT) AS max_col,
             (SELECT CAST(max(nx) AS HUGEINT) FROM (
                SELECT x, sum(n) AS nx FROM grid GROUP BY x)) AS max_row,
             (SELECT CAST(sum(n) AS HUGEINT) FROM grid) AS n
      FROM (SELECT y, sum(n) AS ny FROM grid GROUP BY y)
    )
    SELECT CAST(m.n AS BIGINT) AS n,
           CAST({hd('1000000::HUGEINT * (r.sum_rowmax - m.max_col)',
                    'm.n - m.max_col')} AS BIGINT) AS lambda_y_given_x_micro,
           CAST({hd('1000000::HUGEINT * (c.sum_colmax - m.max_row)',
                    'm.n - m.max_row')} AS BIGINT) AS lambda_x_given_y_micro,
           CAST({hd(
               '1000000::HUGEINT * ((r.sum_rowmax + c.sum_colmax) - (m.max_col + m.max_row))',
               '2 * m.n - (m.max_col + m.max_row)')} AS BIGINT)
             AS lambda_symmetric_micro
    FROM rowmax r, colmax c, marg m
    """


@register("stats_goodman_kruskal_lambda", oracle=_lambda_oracle())
def stats_goodman_kruskal_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal lambda for order priority x order status — the
    modal proportional-reduction-in-error association (Goodman &
    Kruskal 1954): how much better you predict the STATUS knowing the
    priority than by always guessing the modal status (and the
    transposed and symmetric versions). Gamma / Somers' D in the
    family price ORDINAL concordance; lambda is the purely NOMINAL
    PRE measure — zero exactly when every priority row has the same
    modal status, regardless of how the probabilities differ off the
    mode.

    Exactness: lambda is a ratio of integer count differences
    (sum of row maxima minus the modal column margin over N minus the
    modal column margin) — pure int64/decimal arithmetic with ONE
    half-up micro division per reported direction.

    Scale shape: one fact scan partial-aggregates to the bounded
    (5 priorities x |statuses|) grid; everything after is grid-sized
    algebra. 1 row out.
    """
    t = Tables(spark, sf_dir)
    grid = _ps_grid(t)
    rowmax = grid.groupBy("x").agg(F.max("n").alias("mx")).agg(
        F.sum("mx").alias("sum_rowmax")
    )
    colmax = grid.groupBy("y").agg(F.max("n").alias("mx")).agg(
        F.sum("mx").alias("sum_colmax")
    )
    colmarg = grid.groupBy("y").agg(F.sum("n").alias("ny")).agg(
        F.max("ny").alias("max_col")
    )
    rowmarg = grid.groupBy("x").agg(F.sum("n").alias("nx")).agg(
        F.max("nx").alias("max_row")
    )
    tot = grid.agg(F.sum("n").alias("n"))
    j = (
        rowmax.crossJoin(F.broadcast(colmax))
        .crossJoin(F.broadcast(colmarg))
        .crossJoin(F.broadcast(rowmarg))
        .crossJoin(F.broadcast(tot))
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    two = F.lit(2).cast("decimal(38,0)")
    return j.select(
        F.col("n").cast("long").alias("n"),
        _halfup_div(
            m6 * (F.col("sum_rowmax") - F.col("max_col")),
            F.col("n") - F.col("max_col"),
        )
        .cast("long")
        .alias("lambda_y_given_x_micro"),
        _halfup_div(
            m6 * (F.col("sum_colmax") - F.col("max_row")),
            F.col("n") - F.col("max_row"),
        )
        .cast("long")
        .alias("lambda_x_given_y_micro"),
        _halfup_div(
            m6
            * (
                (F.col("sum_rowmax") + F.col("sum_colmax"))
                - (F.col("max_col") + F.col("max_row"))
            ),
            two * F.col("n") - (F.col("max_col") + F.col("max_row")),
        )
        .cast("long")
        .alias("lambda_symmetric_micro"),
    )


# ---------------------------------------------------------------------------
# 2. Goodman-Kruskal tau (variance PRE)
# ---------------------------------------------------------------------------


def _gk_tau_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH {_SQL_PS_GRID.strip()}
    , rows_ AS (
      SELECT x, CAST(sum(n) AS HUGEINT) AS nx,
             CAST(sum(n * n) AS HUGEINT) AS a_x
      FROM grid GROUP BY x
    ), tot AS (
      SELECT CAST(sum(nx) AS HUGEINT) AS n FROM rows_
    ), cols AS (
      SELECT CAST(sum(ny * ny) AS HUGEINT) AS b FROM (
        SELECT y, CAST(sum(n) AS HUGEINT) AS ny FROM grid GROUP BY y)
    ), terms AS (
      SELECT CAST(sum({hd('1000000::HUGEINT * t.n * r.a_x', 'r.nx')})
                  AS HUGEINT) AS num_t
      FROM rows_ r, tot t
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST({hd('(tm.num_t - 1000000::HUGEINT * c.b)',
                    '(t.n * t.n - c.b)')} AS BIGINT) AS gk_tau_micro
    FROM tot t, cols c, terms tm
    """


@register("stats_goodman_kruskal_tau", oracle=_gk_tau_oracle())
def stats_goodman_kruskal_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal tau for order status given order priority — the
    variance-based PRE sibling of lambda: the proportional reduction
    in Gini concentration of the status distribution when the priority
    is known, tau = (N * sum_x (sum_y n_xy^2)/n_x - sum_y n_y^2) /
    (N^2 - sum_y n_y^2). Lambda only sees the MODE move; tau responds
    to any probability shift (the reason it's the default nominal PRE
    in categorical data analysis texts, e.g. Agresti §2.4).

    Exactness: the per-row-category term N * A_x / n_x quantizes
    half-up at micro once (exact integer A_x = sum of squared cell
    counts), the quantized terms sum as integers, and ONE final
    half-up division produces the micro statistic — deterministic in
    any partitioning/order.

    Scale shape: identical to lambda — one partial-aggregated scan to
    the bounded grid, grid-sized algebra, 1 row out. Headroom: the
    per-term numerator 1e6 * N * A_x <= 1e6 * N * n_x^2 ~ 1e6 * N^3
    peaks ~1e30 at 1e8-row grids cells — inside decimal(38,0).
    """
    t = Tables(spark, sf_dir)
    grid = _ps_grid(t)
    rows_ = grid.groupBy("x").agg(
        F.sum("n").alias("nx"), F.sum(F.col("n") * F.col("n")).alias("a_x")
    )
    tot = rows_.agg(F.sum("nx").alias("n"))
    cols = (
        grid.groupBy("y")
        .agg(F.sum("n").alias("ny"))
        .agg(F.sum(F.col("ny") * F.col("ny")).alias("b"))
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    terms = rows_.crossJoin(F.broadcast(tot)).select(
        _halfup_div(m6 * F.col("n") * F.col("a_x"), F.col("nx")).alias("t_x")
    ).agg(F.sum("t_x").alias("num_t"))
    j = tot.crossJoin(F.broadcast(cols)).crossJoin(F.broadcast(terms))
    return j.select(
        F.col("n").cast("long").alias("n"),
        _halfup_div(
            F.col("num_t") - m6 * F.col("b"),
            F.col("n") * F.col("n") - F.col("b"),
        )
        .cast("long")
        .alias("gk_tau_micro"),
    )


# ---------------------------------------------------------------------------
# shared: per-language token frequency spectrum (two consumers below)
# ---------------------------------------------------------------------------

_SQL_FREQ_SPECTRUM = """
    toks AS (
      SELECT lang,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                    ' ')) AS tok
      FROM documents
    ), tf AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY lang, tok
    ), spectrum AS (
      SELECT lang,
             CAST(sum(c) AS HUGEINT) AS n_tokens,
             CAST(count(*) AS HUGEINT) AS vocab,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS v1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS v2
      FROM tf GROUP BY lang
    )
"""


def _freq_spectrum(t: Tables) -> DataFrame:
    """(lang, n_tokens, vocab, v1, v2) — the frequency-spectrum head
    both lexical ops consume (SQL twin ``_SQL_FREQ_SPECTRUM``)."""
    from ..functions.textnorm import whitespace_tokens

    tf = (
        t.documents.select(
            "lang", F.explode(whitespace_tokens(F.col("text"))).alias("tok")
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tf.groupBy("lang").agg(
        F.sum(_dec(F.col("c"))).alias("n_tokens"),
        _dec(F.count(F.lit(1))).alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("decimal(38,0)").alias("v1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("decimal(38,0)").alias("v2"),
    )


# ---------------------------------------------------------------------------
# 3. Sichel's S + Guiraud's R^2 lexical richness
# ---------------------------------------------------------------------------


def _sichel_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH {_SQL_FREQ_SPECTRUM.strip()}
    SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab, CAST(v2 AS BIGINT) AS v2,
           CAST({hd('1000000::HUGEINT * v2', 'vocab')} AS BIGINT)
             AS sichel_s_micro,
           CAST({hd('1000000::HUGEINT * vocab * vocab', 'n_tokens')} AS BIGINT)
             AS guiraud_sq_micro
    FROM spectrum ORDER BY lang
    """


@register("text_sichel_guiraud_richness", oracle=_sichel_oracle())
def text_sichel_guiraud_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sichel's S and (squared) Guiraud's R per language — two
    frequency-spectrum richness statistics beside Honoré's R and
    Yule's K: S = V2/V (Sichel 1975 — the dis-legomena share, nearly
    constant for an author across sample sizes, so a shift flags mixed
    or templated sources) and Guiraud's R = V/sqrt(N) (1954 — the
    length-corrected type-token ratio), reported as R^2 = V^2/N so the
    statistic stays inside exact rational arithmetic (no sqrt; the
    squared form is order-preserving, documented convention shared
    with the squared-index ops in the stats family).

    Derivation sharing: the per-language frequency spectrum
    (``_freq_spectrum`` / ``_SQL_FREQ_SPECTRUM``) — one (lang, token)
    aggregate feeding this op and ``corpus_good_turing_coverage``.

    Exactness: V, V2, N are exact counts; two half-up micro divisions
    per language.

    Scale shape: one scan exploding to (lang, token) with partial
    aggregation (map-side combine absorbs the token skew), then
    per-language scalars. |langs| rows out.
    """
    t = Tables(spark, sf_dir)
    sp = _freq_spectrum(t)
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    return sp.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.col("v2").cast("long").alias("v2"),
        _halfup_div(m6 * F.col("v2"), F.col("vocab")).cast("long").alias(
            "sichel_s_micro"
        ),
        _halfup_div(m6 * F.col("vocab") * F.col("vocab"), F.col("n_tokens"))
        .cast("long")
        .alias("guiraud_sq_micro"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# 4. Good-Turing sample coverage + Chao1 richness floor
# ---------------------------------------------------------------------------


def _gt_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH {_SQL_FREQ_SPECTRUM.strip()}
    SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab, CAST(v1 AS BIGINT) AS v1,
           CAST(1000000 - {hd('1000000::HUGEINT * v1', 'n_tokens')} AS BIGINT)
             AS coverage_micro,
           CAST({hd('1000000::HUGEINT * v1', 'n_tokens')} AS BIGINT)
             AS p_unseen_micro,
           CASE WHEN v2 > 0 THEN
             CAST(100 * vocab + {hd('100::HUGEINT * v1 * v1', '2 * v2')} AS BIGINT)
           END AS chao1_centi
    FROM spectrum ORDER BY lang
    """


@register("corpus_good_turing_coverage", oracle=_gt_oracle())
def corpus_good_turing_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing sample coverage per language: C = 1 - V1/N (Good
    1953) — the probability that the NEXT token drawn is a type
    already seen — plus the unseen-mass estimate V1/N and the Chao1
    nonparametric richness floor V + V1^2/(2 V2) (Chao 1984). The
    corpus-planning numbers behind "have we crawled enough of this
    language": low coverage = the vocabulary is still growing fast and
    more data materially helps; Chao1 - V = how many types the crawl
    provably hasn't seen yet.

    Derivation sharing: the same per-language frequency spectrum as
    ``text_sichel_guiraud_richness`` (one derivation, two consumers).

    Exactness: V1, V2, V, N exact; one half-up micro division for the
    unseen mass (coverage is its exact complement, 1e6 - p_unseen, so
    the pair is consistent by construction); Chao1 reported in centi
    units with its single half-up division, NULL-guarded for V2 = 0.

    Scale shape: identical to the sibling — one (lang, token) partial
    aggregate, per-language scalars, |langs| rows out.
    """
    t = Tables(spark, sf_dir)
    sp = _freq_spectrum(t)
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    c100 = F.lit(100).cast("decimal(38,0)")
    p_unseen = _halfup_div(m6 * F.col("v1"), F.col("n_tokens"))
    return sp.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.col("v1").cast("long").alias("v1"),
        (F.lit(1_000_000) - p_unseen).cast("long").alias("coverage_micro"),
        p_unseen.cast("long").alias("p_unseen_micro"),
        F.when(
            F.col("v2") > 0,
            (
                c100 * F.col("vocab")
                + _halfup_div(
                    c100 * F.col("v1") * F.col("v1"),
                    F.lit(2).cast("decimal(38,0)") * F.col("v2"),
                )
            ).cast("long"),
        ).alias("chao1_centi"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# 5. MinHash estimator audit over the blocked candidate pairs
# ---------------------------------------------------------------------------


def _minhash_audit_oracle() -> str:
    from .dedup import _SQL_SHINGLES, _sql_minhash, N_MINHASH

    hcols = ",\n             ".join(_sql_minhash(i) for i in range(N_MINHASH))
    kmatch = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(N_MINHASH)
    )
    hd = _sql_halfup_div
    return f"""
    WITH norm AS (
{_SQL_SHINGLES}
    ), keyed AS (
      SELECT n.doc_id, d.lang, d.n_chars // 100 AS len_bucket,
             list_distinct(list_transform(n.shingles,
               s -> ('0x' || substr(sha256(s), 1, 15))::BIGINT)) AS hs,
             {hcols}
      FROM norm n JOIN documents d USING (doc_id)
      WHERE len(n.shingles) > 0
    ), pairs AS (
      SELECT CAST(({kmatch}) AS BIGINT) AS k,
             CAST(len(list_intersect(a.hs, b.hs)) AS HUGEINT) AS inter,
             CAST(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))
                  AS HUGEINT) AS un
      FROM keyed a JOIN keyed b
        ON a.lang = b.lang AND a.len_bucket = b.len_bucket
       AND a.doc_id < b.doc_id
    ), jm AS (
      SELECT k, {hd('1000000::HUGEINT * inter', 'un')} AS jac_micro
      FROM pairs
    ), byk AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(jac_micro) AS HUGEINT) AS sj
      FROM jm GROUP BY k
    )
    SELECT k AS n_sig_matches, n_pairs,
           CAST({hd('sj', 'n_pairs')} AS BIGINT) AS mean_jaccard_micro,
           CAST({hd(f'1000000::HUGEINT * k', str(N_MINHASH))} AS BIGINT)
             AS est_jaccard_micro,
           CAST({hd(f'1000000::HUGEINT * k', str(N_MINHASH))}
                - {hd('sj', 'n_pairs')} AS BIGINT) AS bias_micro
    FROM byk ORDER BY k
    """


@register("dedup_minhash_estimator_audit", oracle=_minhash_audit_oracle())
def dedup_minhash_estimator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality audit: over the blocked candidate
    pair set (the ``dedup_ngram_jaccard`` lang x length-bucket
    blocking), group pairs by how many of the 8 signature components
    agree and compare the MinHash estimate k/8 against the mean EXACT
    shingle Jaccard of those pairs. The estimator is unbiased per pair
    (P[h_i(A) = h_i(B)] = J); this table shows what the 8-permutation
    variance does to it in THIS corpus — the empirical error the
    ``dedup_lsh_band_tuning_curve`` S-curves assume, measured instead
    of assumed (Broder 1997).

    Derivation sharing: shingle base hashes via
    ``textnorm.shingle_base_hash_udf`` and the signature family via
    ``dedup._minhash_cols`` / ``dedup._sql_minhash`` — the exact
    objects the production LSH pipeline uses, so the audit audits the
    shipped estimator, not a lookalike.

    Exactness: signature agreement counts are integer; the exact
    Jaccard quantizes half-up at micro per pair from integer
    intersection/union sizes and SUMS as integers (never a double
    mean); the estimate k/8 and the bias are exact micro arithmetic.

    Scale shape: the pair generation is the registered blocked
    equi-self-join (no crossJoin, no all-pairs); signature columns add
    8 integer comparisons per candidate; the audit aggregate is
    <= 9-key bounded. <= 9 rows out.
    """
    from ..functions.partitioning import cpu_repartition, gated_broadcast
    from ..functions.textnorm import shingle_base_hash_udf
    from .dedup import (
        MERSENNE_P,
        N_MINHASH,
        SHINGLE_K,
        _minhash_cols,
        pair_intersections_table,
    )

    # Round-14 optimization: the blocked pair set + exact intersection
    # sizes come off the session-materialized
    # ``dedup.pair_intersections_table`` (one derivation, five
    # consumers); the 8 signature components are recomputed once per
    # document (a doc-sized table, gated-broadcast onto each pair
    # side) instead of riding through the pair self-join. All the
    # audit's integers are unchanged, so jac_micro/k and the oracle
    # are value-identical.
    t = Tables(spark, sf_dir)
    bases_udf = shingle_base_hash_udf(SHINGLE_K)
    sigs = (
        cpu_repartition(t.documents, "doc_id")
        .select("doc_id", bases_udf(F.col("text")).alias("hs"))
        .filter(F.size("hs") > 0)
        .select(
            "doc_id",
            *_minhash_cols(F.transform(F.col("hs"), lambda x: x % MERSENNE_P)),
        )
    )
    pairs = pair_intersections_table(t).filter(F.col("lb_a") == F.col("lb_b"))
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(N_MINHASH)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(N_MINHASH)],
    )
    k = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    ).cast("long")
    inter = F.col("inter")
    union = F.col("sa") + F.col("sb") - inter
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    jm = (
        pairs.join(gated_broadcast(sa), "doc_a")
        .join(gated_broadcast(sb), "doc_b")
        .select(
            k.alias("k"),
            _halfup_div(m6 * _dec(inter), _dec(union)).alias("jac_micro"),
        )
    )
    byk = jm.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("jac_micro").alias("sj"),
    )
    est = _halfup_div(m6 * _dec(F.col("k")), F.lit(N_MINHASH).cast("decimal(38,0)"))
    mean_j = _halfup_div(F.col("sj"), _dec(F.col("n_pairs")))
    return byk.select(
        F.col("k").alias("n_sig_matches"),
        "n_pairs",
        mean_j.cast("long").alias("mean_jaccard_micro"),
        est.cast("long").alias("est_jaccard_micro"),
        (est - mean_j).cast("long").alias("bias_micro"),
    ).orderBy("n_sig_matches")
