"""Text normalization / shingling column expressions.

Everything here is a pure ``pyspark.sql.functions`` composition — JVM
side, whole-stage-codegen'd, no Python in the hot path. Each helper has
an exact DuckDB-SQL twin (documented inline) so dedup/text queries can
be oracle-verified value-for-value.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """lower + trim + collapse runs of whitespace to single spaces.

    DuckDB twin: ``trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))``
    """
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def whitespace_tokens(col: Column) -> Column:
    """Split normalized text on single spaces -> array<string>.

    DuckDB twin: ``string_split(<normalized>, ' ')``
    """
    return F.split(normalized_text(col), " ")


def word_shingles(tokens: Column, k: int) -> Column:
    """k-word shingles (space-joined) from a token array -> array<string>.

    For ``n`` tokens produces ``max(n - k + 1, 0)`` shingles; documents
    shorter than ``k`` tokens produce an empty array.

    DuckDB twin (1-based list slicing)::

        [array_to_string(toks[i:i+K-1], ' ')
         for i in range(1, greatest(len(toks) - K + 1, 0))]
    """
    # sequence(1, 0) defaults to step -1 and yields [1, 0]; slicing at
    # index 0 then throws. Guard: short docs get an explicit empty array.
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    return F.when(
        n >= F.lit(k),
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k))),
    ).otherwise(F.array().cast("array<string>"))


def sha256_hex(col: Column) -> Column:
    """Lower-case hex SHA-256 — identical in Spark and DuckDB.

    DuckDB twin: ``sha256(x)``
    """
    return F.sha2(col, 256)


def sha256_prefix_i64(col: Column) -> Column:
    """First 15 hex chars of sha256 parsed as a (positive) int64.

    A portable deterministic 60-bit hash: Spark and DuckDB produce the
    same value, unlike xxhash64 / hash() which are engine-specific.

    DuckDB twin: ``(('0x' || substr(sha256(x), 1, 15)))::BIGINT``
    """
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def shingle_base_hash_udf(k: int, mod: int | None = None):
    """Arrow pandas UDF: text -> distinct k-word-shingle base hashes
    (int64, sha256-prefix — value-identical to the JVM/DuckDB twins).

    The shingle construction is the one CPU-heavy per-row stage of the
    dedup pipeline; in interpreted higher-order functions it costs ~4x
    what this vectorized Python path does, and the hash values are
    bit-identical, so the oracle SQL is unchanged in meaning:

        list_distinct(list_transform(<distinct shingles>,
            s -> ('0x' || substr(sha256(s), 1, 15))::BIGINT [% mod]))
    """
    import hashlib
    import re

    ws = re.compile(r"\s+")

    @F.pandas_udf("array<long>")
    def bases(text: pd.Series) -> pd.Series:
        out = []
        for s in text:
            toks = ws.sub(" ", s.lower()).strip().split(" ")
            seen: set[str] = set()
            vals: list[int] = []
            vset: set[int] = set()
            for i in range(len(toks) - (k - 1)):
                sh = " ".join(toks[i : i + k])
                if sh in seen:
                    continue
                seen.add(sh)
                v = int(hashlib.sha256(sh.encode()).hexdigest()[:15], 16)
                if mod is not None:
                    v %= mod
                if v not in vset:
                    vset.add(v)
                    vals.append(v)
            out.append(vals)
        return pd.Series(out)

    return bases
