"""Round-14 direct registrations, batch AB (lexical-richness log
family, readability, Kneser-Ney discount estimation, character-level
conditional entropy, vocabulary mass coverage, and train/val OOV).

Six window-slot completions, each oracle-paired, replica-pinned and
plan-barred in ``tests/test_roundfourteen7.py`` (same-commit gate
rule). Every name was checked against the full 593-name registry
inventory before design (the SCALE §5j.7 authoring rule):

* ``text_herdan_maas_lexical`` — Herdan's C, Dugast's U and Maas's
  a^2 per language (the log-log richness family, deterministic ln).
* ``text_readability_ari_cli`` — Automated Readability Index and
  Coleman-Liau per language from pure character/word/sentence counts.
* ``corpus_kneser_ney_discounts`` — modified Kneser-Ney discounts
  D1/D2/D3+ from the bigram count-of-counts (Chen & Goodman 1999).
* ``text_char_bigram_cond_entropy`` — character-level conditional
  entropy H(c2|c1) per language (the char-LM compressibility floor).
* ``corpus_bigram_topk_mass_coverage`` — share of bigram token mass
  covered by the top-100/1k/10k bigram types (vocab sizing curve).
* ``corpus_oov_rate_val_split`` — out-of-vocabulary type and mass
  rates of the val split against the train vocabulary, per language.

Reference parity note: the reference (Go ingestion pipeline,
``/root/reference/main.go``) has no analytics; these extend SURVEY
§2.C text analysis / corpus management.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables
from .roundeleven import _dec, _halfup_div, _sql_halfup_div

# ---------------------------------------------------------------------------
# 1. Herdan / Dugast / Maas log-log lexical richness
# ---------------------------------------------------------------------------


def _herdan_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps
    from .roundthirteen6 import _SQL_FREQ_SPECTRUM

    return f"""
    WITH {_SQL_FREQ_SPECTRUM.strip()}
    , base AS (
      SELECT lang, CAST(n_tokens AS BIGINT) AS n, CAST(vocab AS BIGINT) AS v,
             CAST(n_tokens AS DOUBLE) AS nd, CAST(vocab AS DOUBLE) AS vd
      FROM spectrum
    ), {sql_det_ln_steps('base', 'nd', 'ln_n', as_double=True)}
    , {sql_det_ln_steps('ln_n_rel', 'vd', 'ln_v', as_double=True)}
    SELECT lang, n AS n_tokens, v AS vocab,
           CAST(floor(ln_v / ln_n * 1000000.0::DOUBLE + 0.5) AS BIGINT)
             AS herdan_c_micro,
           CASE WHEN ln_n > ln_v THEN
             CAST(floor((ln_n * ln_n) / (ln_n - ln_v)
                        * 1000.0::DOUBLE + 0.5) AS BIGINT)
           END AS dugast_u_milli,
           CAST(floor((ln_n - ln_v) / (ln_n * ln_n)
                      * 1000000000.0::DOUBLE + 0.5) AS BIGINT)
             AS maas_a2_nano
    FROM ln_v_rel ORDER BY lang
    """


@register("text_herdan_maas_lexical", oracle=_herdan_oracle())
def text_herdan_maas_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The log-log lexical richness family per language: Herdan's C =
    ln V / ln N (Herdan 1960), Dugast's U = (ln N)^2/(ln N - ln V)
    and Maas's a^2 = (ln N - ln V)/(ln N)^2 — the three classical
    transformations that make vocabulary richness approximately
    length-invariant (raw TTR collapses as N grows;
    ``text_heaps_law_fit`` fits the growth EXPONENT, these are the
    closed-form per-corpus summaries; Maas is the one usually found
    most stable in corpus-linguistics comparisons). Completes the
    richness shelf beside Honore/Sichel/Guiraud/Yule.

    Exactness: N and V are exact off the shared frequency-spectrum
    head (``roundthirteen6._SQL_FREQ_SPECTRUM``, consumed unchanged);
    both logarithms are the deterministic fixed-point
    ``detmath.det_ln_dbl`` and the three ratios are mirrored IEEE
    double expressions quantized once each (micro/milli/nano to match
    their natural magnitudes). Degenerate V = N corpora NULL Dugast's
    U (division by zero).

    Scale shape: one (lang, token) partial aggregate to per-language
    scalars; constant-size algebra after. |langs| rows out.
    """
    from ..functions.detmath import det_ln_dbl
    from .roundthirteen6 import _freq_spectrum

    sp = _freq_spectrum(Tables(spark, sf_dir))
    ln_n = det_ln_dbl(F.col("n_tokens").cast("double"))
    ln_v = det_ln_dbl(F.col("vocab").cast("double"))
    base = sp.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        ln_n.alias("ln_n"),
        ln_v.alias("ln_v"),
    )
    return base.select(
        "lang",
        "n_tokens",
        "vocab",
        F.floor(F.col("ln_v") / F.col("ln_n") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("herdan_c_micro"),
        F.when(
            F.col("ln_n") > F.col("ln_v"),
            F.floor(
                (F.col("ln_n") * F.col("ln_n")) / (F.col("ln_n") - F.col("ln_v"))
                * F.lit(1e3)
                + F.lit(0.5)
            ).cast("long"),
        ).alias("dugast_u_milli"),
        F.floor(
            (F.col("ln_n") - F.col("ln_v")) / (F.col("ln_n") * F.col("ln_n"))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("maas_a2_nano"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# 2. ARI + Coleman-Liau readability from pure counts
# ---------------------------------------------------------------------------


def _ari_oracle() -> str:
    from .corpus import _SQL_TOKENS

    return f"""
    WITH per_doc AS (
      SELECT lang,
             CAST(len(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT)
               AS letters,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS words,
             CAST(greatest(len(string_split(text, '.')) - 1, 1) AS BIGINT)
               AS sentences
      FROM documents
    ), agg AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(letters) AS HUGEINT) AS l,
             CAST(sum(words) AS HUGEINT) AS w,
             CAST(sum(sentences) AS HUGEINT) AS s
      FROM per_doc GROUP BY lang
    )
    SELECT lang, n_docs,
           CAST(l AS BIGINT) AS letters, CAST(w AS BIGINT) AS words,
           CAST(s AS BIGINT) AS sentences,
           CAST(floor((4.71::DOUBLE * (CAST(l AS DOUBLE) / CAST(w AS DOUBLE))
                       + 0.5::DOUBLE * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                       - 21.43::DOUBLE)
                      * 1000.0::DOUBLE + 0.5) AS BIGINT) AS ari_milli,
           CAST(floor((0.0588::DOUBLE
                         * (CAST(l AS DOUBLE) / CAST(w AS DOUBLE) * 100.0::DOUBLE)
                       - 0.296::DOUBLE
                         * (CAST(s AS DOUBLE) / CAST(w AS DOUBLE) * 100.0::DOUBLE)
                       - 15.8::DOUBLE)
                      * 1000.0::DOUBLE + 0.5) AS BIGINT) AS cli_milli
    FROM agg ORDER BY lang
    """


@register("text_readability_ari_cli", oracle=_ari_oracle())
def text_readability_ari_cli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated Readability Index (Senter & Smith 1967) and
    Coleman-Liau index (1975) per language — the two readability
    grades defined over pure CHARACTER/word/sentence counts (no
    syllable dictionary, so they are exactly computable on any
    corpus and the standard choice for automated pipelines):
    ARI = 4.71 L/W + 0.5 W/S - 21.43, CLI = 0.0588 L' - 0.296 S' -
    15.8 with L', S' per-100-word rates. Corpus-level grade drift is
    a quality-mix signal the per-doc Gopher gates don't surface.

    Exactness: letters (alphanumeric chars), whitespace words and
    period-delimited sentence counts (floored at 1 per document) are
    exact integers summed per language; the two grade formulas are
    mirrored IEEE double expressions over the exact sums (::DOUBLE
    literals — the DECIMAL-literal trap), quantized once at milli.

    Scale shape: one document scan partial-aggregates three integer
    sums per language; constant-size algebra after. |langs| rows out.
    """
    from ..functions.textnorm import whitespace_tokens

    t = Tables(spark, sf_dir)
    letters = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", ""))
    words = F.size(whitespace_tokens(F.col("text")))
    sentences = F.greatest(
        F.size(F.split(F.col("text"), "\\.", -1)) - 1, F.lit(1)
    )
    agg = (
        t.documents.select(
            "lang",
            letters.cast("long").alias("letters"),
            words.cast("long").alias("words"),
            sentences.cast("long").alias("sentences"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(_dec(F.col("letters"))).alias("l"),
            F.sum(_dec(F.col("words"))).alias("w"),
            F.sum(_dec(F.col("sentences"))).alias("s"),
        )
    )
    ld = F.col("l").cast("double")
    wd = F.col("w").cast("double")
    sd = F.col("s").cast("double")
    ari = F.lit(4.71) * (ld / wd) + F.lit(0.5) * (wd / sd) - F.lit(21.43)
    cli = (
        F.lit(0.0588) * (ld / wd * F.lit(100.0))
        - F.lit(0.296) * (sd / wd * F.lit(100.0))
        - F.lit(15.8)
    )
    q3 = lambda c: F.floor(c * F.lit(1e3) + F.lit(0.5)).cast("long")  # noqa: E731
    return agg.select(
        "lang",
        "n_docs",
        F.col("l").cast("long").alias("letters"),
        F.col("w").cast("long").alias("words"),
        F.col("s").cast("long").alias("sentences"),
        q3(ari).alias("ari_milli"),
        q3(cli).alias("cli_milli"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# 3. Modified Kneser-Ney discounts from the bigram count-of-counts
# ---------------------------------------------------------------------------

_SQL_LANG_BIGRAMS = """
    toksd AS (
      SELECT lang,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
               AS toks
      FROM documents
    ), bi AS (
      SELECT lang, toks[i] AS w1, toks[i+1] AS w2
      FROM toksd, unnest(generate_series(1, len(toks) - 1)) AS t(i)
      WHERE len(toks) >= 2
    ), lm AS (
      SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c FROM bi
      GROUP BY lang, w1, w2
    )
"""


def _lang_bigram_counts(t: Tables) -> DataFrame:
    """(lang, w1, w2, c) bigram counts per language — the
    ``text_lm_cross_entropy`` bigram construction keyed by lang (SQL
    twin ``_SQL_LANG_BIGRAMS``)."""
    from ..functions.textnorm import whitespace_tokens

    toks = whitespace_tokens(F.col("text"))
    docs = t.documents.select("lang", toks.alias("toks"))
    bi = (
        docs.where(F.size("toks") >= 2)
        .select(
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("w1"),
                        F.element_at("toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("b"),
        )
        .select("lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    return bi.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))


def _kn_oracle() -> str:
    hd = _sql_halfup_div
    return f"""
    WITH {_SQL_LANG_BIGRAMS.strip()}
    , coc AS (
      SELECT lang,
             CAST(sum(c) AS HUGEINT) AS n_bigrams,
             CAST(count(*) AS HUGEINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
             CAST(sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS HUGEINT) AS n3,
             CAST(sum(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS HUGEINT) AS n4
      FROM lm GROUP BY lang
    )
    SELECT lang,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(n3 AS BIGINT) AS n3, CAST(n4 AS BIGINT) AS n4,
           CASE WHEN n1 + 2 * n2 > 0 THEN
             CAST({hd('1000000::HUGEINT * n1', 'n1 + 2 * n2')} AS BIGINT)
           END AS y_micro,
           CASE WHEN n1 > 0 THEN
             CAST(1000000 - {hd('2000000::HUGEINT * n1 * n2',
                                '(n1 + 2 * n2) * n1')} AS BIGINT)
           END AS d1_micro,
           CASE WHEN n2 > 0 THEN
             CAST(2000000 - {hd('3000000::HUGEINT * n1 * n3',
                                '(n1 + 2 * n2) * n2')} AS BIGINT)
           END AS d2_micro,
           CASE WHEN n3 > 0 AND n1 + 2 * n2 > 0 THEN
             CAST(3000000 - {hd('4000000::HUGEINT * n1 * n4',
                                '(n1 + 2 * n2) * n3')} AS BIGINT)
           END AS d3_micro
    FROM coc ORDER BY lang
    """


@register("corpus_kneser_ney_discounts", oracle=_kn_oracle())
def corpus_kneser_ney_discounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified Kneser-Ney absolute-discount estimates (Chen &
    Goodman 1999) from the bigram count-of-counts per language:
    Y = n1/(n1 + 2 n2) and D_k = k - (k+1) Y n_{k+1}/n_k for
    k = 1, 2, 3+ — the closed-form discounts the best-performing
    classical n-gram smoother uses, derived entirely from how many
    bigram types occur once/twice/three/four times. Beside
    ``text_lm_cross_entropy`` (which scores docs under the unsmoothed
    LM) this is the smoothing-parameter side of the same pipeline,
    and the n1/n2 spectrum doubles as the Good-Turing view of bigram
    novelty.

    Exactness: the count-of-counts are exact integers off the
    vocab^2-bounded bigram LM aggregate; Y and each D_k are single
    half-up micro divisions of exact integer products (the k and
    (k+1)Y terms combine to one ratio each by cross-multiplication).
    Y/D1 NULL on degenerate spectra with no hapax bigrams (n1 = 0 --
    the x10 replicated fixture hits exactly this: every count is a
    multiple of 10, caught by the pre-registration ladder); D2/D3
    NULL when their denominators n2/n3 are empty.

    Scale shape: the bigram explode is the established LM
    construction (map-side from the token array); two bounded
    aggregates follow. |langs| rows out.
    """
    t = Tables(spark, sf_dir)
    lm = _lang_bigram_counts(t)
    coc = lm.groupBy("lang").agg(
        F.sum(_dec(F.col("c"))).alias("n_bigrams"),
        _dec(F.count(F.lit(1))).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("decimal(38,0)").alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("decimal(38,0)").alias("n2"),
        F.sum(F.when(F.col("c") == 3, 1).otherwise(0)).cast("decimal(38,0)").alias("n3"),
        F.sum(F.when(F.col("c") == 4, 1).otherwise(0)).cast("decimal(38,0)").alias("n4"),
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    den = F.col("n1") + 2 * F.col("n2")
    return coc.select(
        "lang",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("n3").cast("long").alias("n3"),
        F.col("n4").cast("long").alias("n4"),
        F.when(
            den > 0, _halfup_div(m6 * F.col("n1"), den).cast("long")
        ).alias("y_micro"),
        F.when(
            F.col("n1") > 0,
            (
                F.lit(1_000_000)
                - _halfup_div(
                    F.lit(2_000_000).cast("decimal(38,0)") * F.col("n1") * F.col("n2"),
                    den * F.col("n1"),
                )
            ).cast("long"),
        ).alias("d1_micro"),
        F.when(
            F.col("n2") > 0,
            (
                F.lit(2_000_000)
                - _halfup_div(
                    F.lit(3_000_000).cast("decimal(38,0)") * F.col("n1") * F.col("n3"),
                    den * F.col("n2"),
                )
            ).cast("long"),
        ).alias("d2_micro"),
        F.when(
            (F.col("n3") > 0) & (den > 0),
            (
                F.lit(3_000_000)
                - _halfup_div(
                    F.lit(4_000_000).cast("decimal(38,0)") * F.col("n1") * F.col("n4"),
                    den * F.col("n3"),
                )
            ).cast("long"),
        ).alias("d3_micro"),
    ).orderBy("lang")

# ---------------------------------------------------------------------------
# 4. Character-bigram conditional entropy per language
# ---------------------------------------------------------------------------


def _char_ce_oracle() -> str:
    from ..functions.detmath import sql_det_ln_steps

    return f"""
    WITH chars AS (
      SELECT lang, lower(text) AS txt FROM documents WHERE len(text) >= 2
    ), cb AS (
      SELECT lang, substr(txt, i, 1) AS c1, substr(txt, i + 1, 1) AS c2
      FROM chars, unnest(generate_series(1, len(txt) - 1)) AS t(i)
    ), big AS (
      SELECT lang, c1, c2, CAST(count(*) AS BIGINT) AS c12
      FROM cb GROUP BY lang, c1, c2
    ), ctx AS (
      SELECT lang, c1, CAST(sum(c12) AS BIGINT) AS c1n FROM big
      GROUP BY lang, c1
    ), nn AS (
      SELECT lang, CAST(sum(c12) AS BIGINT) AS n FROM big GROUP BY lang
    ), j AS (
      SELECT b.lang, b.c12, x.c1n, t.n,
             CAST(b.c12 AS DOUBLE) / CAST(x.c1n AS DOUBLE) AS rat
      FROM big b JOIN ctx x USING (lang, c1) JOIN nn t USING (lang)
    ), {sql_det_ln_steps('j', 'rat', 'lnr', as_double=True)}
    , terms AS (
      SELECT lang, n,
             CAST(floor((CAST(c12 AS DOUBLE) / CAST(n AS DOUBLE)) * lnr
                        * 1000000000.0::DOUBLE + 0.5) AS BIGINT) AS t_nano
      FROM lnr_rel
    )
    SELECT lang, CAST(max(n) AS BIGINT) AS n_char_bigrams,
           CAST(-sum(t_nano) AS BIGINT) AS cond_entropy_nano
    FROM terms GROUP BY lang ORDER BY lang
    """


@register("text_char_bigram_cond_entropy", oracle=_char_ce_oracle())
def text_char_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level conditional entropy H(c_next | c) per language
    — Shannon's (1951) printed-language entropy experiment run on the
    corpus itself: the expected surprisal of the next character given
    the current one, - sum p(c1,c2) ln(p(c2|c1)) in nats. This is the
    order-1 compressibility floor of the raw text (a char-LM or a
    byte-BPE cannot beat it without longer context), so per-language
    drift flags encoding damage and boilerplate that token-level
    entropy (``text_token_entropy``) smooths over.
    ``text_char_trigram_profile`` catalogs WHICH n-grams dominate;
    this prices the information content in one number.

    Exactness: the char-bigram and context counts are exact integers
    off the bounded (lang x char-pair) grid; each grid cell's
    log-ratio is the deterministic ``det_ln_dbl`` of an exactly-
    representable int64 ratio, and each term quantizes to nano-nats
    BEFORE the order-independent integer sum (the FP discipline).

    Scale shape: the per-character explode is the one heavy stage
    (length-of-corpus rows, map-side generated); everything after
    runs on the bounded character-pair grid (|alphabet|^2 per
    language). |langs| rows out.
    """
    from ..functions.detmath import det_ln_dbl

    t = Tables(spark, sf_dir)
    # split('') yields the native per-char array in O(len); the
    # substr-in-transform formulation re-scans the string per element
    # (O(len^2) per document — measured 8.9 s at sf0.1 / 89 s at x10
    # before this rewrite). Bigrams pair the array with its shift via
    # arrays_zip over slices — identical (c1, c2) stream.
    chars = F.split(F.lower(F.col("text")), "")
    cb = (
        t.documents.where(F.length("text") >= 2)
        .select("lang", chars.alias("cs"))
        .select(
            "lang",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("cs"), 1, F.size("cs") - 1).alias("c1"),
                    F.slice(F.col("cs"), 2, F.size("cs") - 1).alias("c2"),
                )
            ).alias("b"),
        )
        .select("lang", F.col("b.c1").alias("c1"), F.col("b.c2").alias("c2"))
    )
    big = cb.groupBy("lang", "c1", "c2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    ctx = big.groupBy("lang", "c1").agg(F.sum("c12").cast("long").alias("c1n"))
    nn = big.groupBy("lang").agg(F.sum("c12").cast("long").alias("n"))
    j = big.join(ctx, ["lang", "c1"]).join(F.broadcast(nn), "lang")
    rat = F.col("c12").cast("double") / F.col("c1n").cast("double")
    terms = j.select(
        "lang",
        "n",
        F.floor(
            (F.col("c12").cast("double") / F.col("n").cast("double"))
            * det_ln_dbl(rat)
            * F.lit(1_000_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t_nano"),
    )
    return (
        terms.groupBy("lang")
        .agg(
            F.max("n").alias("n_char_bigrams"),
            (-F.sum("t_nano")).cast("long").alias("cond_entropy_nano"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# 5. Bigram token-mass coverage by top-k types
# ---------------------------------------------------------------------------

TOPK_MASS_KS = (100, 1_000, 10_000)


def _topk_mass_oracle() -> str:
    hd = _sql_halfup_div
    parts = [
        f"""
    WITH {_SQL_LANG_BIGRAMS.strip()}
    , lm_g AS (
      SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c FROM lm GROUP BY w1, w2
    ), tot AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n, CAST(count(*) AS HUGEINT) AS v
      FROM lm_g
    )"""
    ]
    selects = []
    for k in TOPK_MASS_KS:
        parts.append(
            f"""
    , top{k} AS (
      SELECT CAST(sum(c) AS HUGEINT) AS mass FROM (
        SELECT c FROM lm_g ORDER BY c DESC, w1, w2 LIMIT {k})
    )"""
        )
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS k, CAST(t.n AS BIGINT) AS total_mass, "
            f"CAST(least(m.mass, t.n) AS BIGINT) AS topk_mass, "
            f"CAST({hd('1000000::HUGEINT * m.mass', 't.n')} AS BIGINT) "
            f"AS coverage_micro FROM top{k} m, tot t"
        )
    return "".join(parts) + " " + " UNION ALL ".join(selects) + " ORDER BY k"


@register("corpus_bigram_topk_mass_coverage", oracle=_topk_mass_oracle())
def corpus_bigram_topk_mass_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of total bigram token mass covered by the top-100 /
    top-1k / top-10k most frequent bigram types (ties broken by the
    bigram text, so the cut is deterministic) — the Zipfian
    concentration curve a tokenizer/vocabulary designer reads before
    choosing merge counts: if 10k types cover 95% of mass, a larger
    bigram vocabulary buys almost nothing.
    ``corpus_bpe_pair_counts`` surfaces the merge candidates;
    ``text_zipf_fit`` fits the exponent; this prices the cumulative
    payoff at the three canonical cut sizes.

    Exactness: global bigram counts are exact; each top-k mass is an
    exact integer sum over a deterministically-ordered LIMIT k
    (count desc, then bigram text asc); coverage is ONE half-up micro
    division per k.

    Scale shape: the bigram LM aggregate is the established map-side
    construction; each top-k is a TakeOrderedAndProject (never a
    global sort materialization) followed by a constant-size
    aggregate. 3 rows out.
    """
    t = Tables(spark, sf_dir)
    lm_g = (
        _lang_bigram_counts(t)
        .groupBy("w1", "w2")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    tot = lm_g.agg(
        F.sum(_dec(F.col("c"))).alias("n"), _dec(F.count(F.lit(1))).alias("v")
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    outs = []
    for k in TOPK_MASS_KS:
        topk = (
            lm_g.orderBy(F.col("c").desc(), "w1", "w2")
            .limit(k)
            .agg(F.sum(_dec(F.col("c"))).alias("mass"))
        )
        outs.append(
            topk.crossJoin(F.broadcast(tot)).select(
                F.lit(k).cast("long").alias("k"),
                F.col("n").cast("long").alias("total_mass"),
                F.least(F.col("mass"), F.col("n")).cast("long").alias("topk_mass"),
                _halfup_div(m6 * F.col("mass"), F.col("n"))
                .cast("long")
                .alias("coverage_micro"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("k")


# ---------------------------------------------------------------------------
# 6. OOV rate of the val split against the train vocabulary
# ---------------------------------------------------------------------------


def _oov_oracle() -> str:
    from .corpus import _SQL_ID_HASH, _SQL_TOKENS, TRAIN_CUT, VAL_CUT

    hd = _sql_halfup_div
    return f"""
    WITH assigned AS (
      SELECT lang, text,
             CASE WHEN {_SQL_ID_HASH} % 100 < {TRAIN_CUT} THEN 'train'
                  WHEN {_SQL_ID_HASH} % 100 < {VAL_CUT} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ), toks AS (
      SELECT lang, split, unnest({_SQL_TOKENS}) AS tok FROM assigned
      WHERE split IN ('train', 'val')
    ), tf AS (
      SELECT lang, split, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY lang, split, tok
    ), val_t AS (
      SELECT lang, tok, c FROM tf WHERE split = 'val'
    ), train_v AS (
      SELECT DISTINCT lang, tok FROM tf WHERE split = 'train'
    ), marked AS (
      SELECT v.lang, v.c,
             CASE WHEN tr.tok IS NULL THEN 1 ELSE 0 END AS oov
      FROM val_t v LEFT JOIN train_v tr USING (lang, tok)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS val_types,
           CAST(sum(oov) AS BIGINT) AS oov_types,
           CAST(sum(c) AS BIGINT) AS val_tokens,
           CAST(sum(CASE WHEN oov = 1 THEN c ELSE 0 END) AS BIGINT) AS oov_tokens,
           CAST({hd('1000000::HUGEINT * sum(oov)', 'count(*)')} AS BIGINT)
             AS oov_type_rate_micro,
           CAST({hd('1000000::HUGEINT * sum(CASE WHEN oov = 1 THEN c ELSE 0 END)',
                    'sum(c)')} AS BIGINT) AS oov_mass_rate_micro
    FROM marked GROUP BY lang ORDER BY lang
    """


@register("corpus_oov_rate_val_split", oracle=_oov_oracle())
def corpus_oov_rate_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit of the deterministic val split against
    the train vocabulary, per language: what fraction of val token
    TYPES — and, the number that actually matters for loss, what
    fraction of val token MASS — never appears in train. High OOV
    mass means the eval perplexity will be dominated by unseen-token
    handling rather than model quality; the per-language spread flags
    splits that starved a language. Uses the SAME sha256 doc-id
    buckets as ``split_train_val_test`` (split membership must be a
    pure function of the key — the established convention), so this
    audits the split the pipeline actually ships.

    Exactness: split assignment is the exact integer hash bucket;
    type and mass counts are exact integers off the (lang, split,
    token) partial aggregate; the two rates are single half-up micro
    divisions.

    Scale shape: one token explode partial-aggregates to the
    vocab-bounded (lang, split, token) grid; the OOV mark is one
    vocab-sized left join (never a row-level join); |langs| rows out.
    """
    from .corpus import TRAIN_CUT, VAL_CUT, _id_hash_bucket
    from ..functions.textnorm import whitespace_tokens

    t = Tables(spark, sf_dir)
    b = _id_hash_bucket()
    assigned = t.documents.select(
        "lang",
        "text",
        F.when(b < TRAIN_CUT, F.lit("train"))
        .when(b < VAL_CUT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).where(F.col("split").isin("train", "val"))
    tf = (
        assigned.select(
            "lang", "split", F.explode(whitespace_tokens(F.col("text"))).alias("tok")
        )
        .groupBy("lang", "split", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    val_t = tf.where(F.col("split") == "val").select("lang", "tok", "c")
    train_v = tf.where(F.col("split") == "train").select("lang", "tok").distinct()
    marked = val_t.join(
        train_v.withColumn("in_train", F.lit(1)), ["lang", "tok"], "left"
    ).select(
        "lang",
        "c",
        F.when(F.col("in_train").isNull(), 1).otherwise(0).alias("oov"),
    )
    m6 = F.lit(1_000_000).cast("decimal(38,0)")
    oov_mass = F.sum(F.when(F.col("oov") == 1, _dec(F.col("c"))).otherwise(F.lit(0).cast("decimal(38,0)")))
    return (
        marked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("val_types"),
            F.sum("oov").cast("long").alias("oov_types"),
            F.sum("c").cast("long").alias("val_tokens"),
            oov_mass.cast("long").alias("oov_tokens"),
            _halfup_div(m6 * _dec(F.sum("oov")), _dec(F.count(F.lit(1))))
            .cast("long")
            .alias("oov_type_rate_micro"),
            _halfup_div(m6 * oov_mass, F.sum(_dec(F.col("c"))))
            .cast("long")
            .alias("oov_mass_rate_micro"),
        )
        .orderBy("lang")
    )
