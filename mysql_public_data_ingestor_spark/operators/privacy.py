"""Privacy / compliance operators for a training-data pipeline:
denylist redaction and k-anonymity auditing.

Scale shape: redaction is a pure per-row projection (regex inside
whole-stage codegen — no UDF, no shuffle); the k-anonymity audit is
one groupBy on the quasi-identifier tuple. Both run as cheaply as a
scan, which is the requirement for "scrub every batch before it
lands".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables

# stand-in sensitive-term dictionary (the real pipeline loads this
# from a governance source); \b works in both Java regex and RE2
DENYLIST = ("customer", "supplier")
_DENY_RE = r"\b(" + "|".join(DENYLIST) + r")\b"
REDACTION = "[REDACTED]"

K_ANON = 50  # minimum group size for the quasi-identifier tuple


@register(
    "text_redact_denylist",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_DENY_RE}')) AS BIGINT)
             AS n_redactions,
           CAST(length(regexp_replace(text, '{_DENY_RE}', '{REDACTION}', 'g')) AS BIGINT)
             AS redacted_len
    FROM documents
    """,
)
def text_redact_denylist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-based redaction: replace every denylisted term with a
    redaction marker, reporting per-document match counts and the
    post-redaction length.

    Pure projection — regexp_count/regexp_replace are JVM-side inside
    whole-stage codegen, so the scrub adds no shuffle and no Python.
    The same shape serves PII patterns (emails, phone numbers): swap
    the dictionary regex for the PII pattern set.
    """
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.regexp_count("text", F.lit(_DENY_RE)).cast("long").alias("n_redactions"),
        F.length(F.regexp_replace("text", _DENY_RE, REDACTION))
        .cast("long")
        .alias("redacted_len"),
    )


@register(
    "privacy_k_anonymity_audit",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           (count(*) < {K_ANON}) AS violates_k
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment)
    quasi-identifier tuple: any equivalence class smaller than K means
    those rows are re-identifiable at that granularity and must be
    generalized or suppressed before release.

    One groupBy on the QI tuple; output is one row per class —
    bounded by the QI domain, not the table size.
    """
    t = Tables(spark, sf_dir)
    return t.customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) < K_ANON).alias("violates_k"),
    )


# --- deterministic pseudonymization + joinability audit --------------------

PSEUDO_SALT = "corpus-salt-v1"  # rotation = new salt literal (governance)


@register(
    "privacy_pseudonymize_joinability",
    oracle=f"""
    WITH p AS (
      SELECT event_type, user_id,
             substr(sha256('{PSEUDO_SALT}' || CAST(user_id AS VARCHAR)), 1, 16)
               AS pseudonym
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT pseudonym) AS BIGINT) AS n_pseudonyms,
           (count(DISTINCT user_id) = count(DISTINCT pseudonym)) AS joinability_ok
    FROM p GROUP BY event_type
    """,
)
def privacy_pseudonymize_joinability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-hash pseudonymization with a joinability audit: replace
    ``user_id`` with a 64-bit salted-sha256 pseudonym (deterministic, so
    joins/sessionization still work across tables scrubbed with the
    same salt; rotating the salt unlinks historical data), and VERIFY
    the property per event type — distinct pseudonyms must equal
    distinct users, i.e. no hash collision silently merged two people.

    The third leg of the privacy family (redaction = content,
    k-anonymity/l-diversity = aggregates, pseudonymization = keys).
    Scale: the pseudonym is one sha256 projection inside codegen; the
    audit is a two-level count-distinct per event type — partial
    aggregation keyside, constant output.
    """
    t = Tables(spark, sf_dir)
    pseudonym = F.substring(
        F.sha2(F.concat(F.lit(PSEUDO_SALT), F.col("user_id").cast("string")), 256),
        1,
        16,
    )
    p = t.events.select("event_type", "user_id", pseudonym.alias("pseudonym"))
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("pseudonym").alias("n_pseudonyms"),
        (F.countDistinct("user_id") == F.countDistinct("pseudonym")).alias(
            "joinability_ok"
        ),
    )
