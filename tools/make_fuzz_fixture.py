"""Build an adversarially-perturbed copy of a fixture directory for
cross-engine flake hunting.

The driver regenerates /root/testdata between rounds, so an oracle
pairing that only holds for the CURRENT fixture's value distribution is
a latent correctness failure (ADVICE round 2 found two of this class:
an int64 sum-of-squares wrap that needed |value| > ~3e3, and a
round-half-to-even boundary flake). The local gate compares Spark and
DuckDB over IDENTICAL input, so ANY input is a valid probe — this tool
manufactures the inputs most likely to expose divergence:

- **magnitude stress**: prices x100 (cent-quantized squares land within
  ~1 decimal digit of int64 max — any un-widened sum-of-squares wraps),
  event values x1000 (1e6-quantized squares overflow int64 when summed).
- **sign stress**: ~8% of event values negated — exercises the
  round-half-away-from-zero-under-negation paths (integer div rounding
  of negative quantized sums diverges between engines unless handled).
- **short/degenerate documents**: ~1% of docs truncated to 3 chars, one
  doc to a single char, one to the empty string — exercises shingle /
  tokenizer guards (round-2 ADVICE found a short-doc sequence() crash).
  ``n_chars`` is kept consistent with the new text.
- **embedding scale skew**: per-vector scale factor 1 + (vec_id % 5) —
  cosine is scale-invariant in exact math, so any divergence is a
  quantization-boundary artifact (the flake class of ADVICE finding 4).

Keys, row counts, date/timestamp columns, and categorical columns are
NOT perturbed: TPC-H date predicates (1992-1998) and the fixture's key
domains (probe ids, K constants) must keep selecting real rows, or the
gate would "pass" on empty results and test nothing.

A second profile (``--unicode``) plants multibyte text instead: ~4% of
documents get a non-ASCII suffix (accented Latin, CJK, an emoji), with
``n_chars`` kept consistent in CHARACTERS (the driver's convention).
This probes every char-vs-byte seam (length vs octet_length, substr on
code points, regex over non-ASCII in Java-regex vs RE2, shingle/token
hashing over multibyte runes) for cross-engine divergence.

A third profile (``--skew``) redirects ~30% of events to ONE user (the
hottest key a 100 TB event log exhibits): per-key windows
(sessionization, islands, path mining, rolling stats) suddenly carry a
key with ~30% of all rows, and every user-keyed join/aggregate sees a
power-law head. Probes correctness under skew — partition-order
assumptions, per-key state growth, tie-breaking in dense windows —
not just the performance story.

Usage: python tools/make_fuzz_fixture.py [base_sf_dir] [out_dir] [--unicode|--skew]
Then:  python tools/check_correctness.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

PRICE_SCALE = 100.0       # l_extendedprice max ~1.05e5 -> ~1.05e7; cents 1.05e9; cents^2 ~1.1e18 vs int64 max 9.2e18 — 60k-row sums wrap without widening
VALUE_SCALE = 1000.0      # events.value max ~490 -> 4.9e5; 1e6-quant 4.9e11; squares ~2.4e23 — always needs decimal/HUGEINT


N_CLUSTERS = 16
CLUSTER_SIGMA = 0.33  # intra-cluster pairwise cosine ~ 1/(1+sigma^2) ~ 0.90
CLUSTER_SEED = 7


def _emit_clustered_embeddings(base: str, out: str) -> None:
    """Replace the embedding column with planted Gaussian clusters,
    preserving vec_id/label and the list<float> physical type."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(base, "embeddings.parquet"))
    vec_ids = tbl.column("vec_id").to_numpy()
    dim = len(tbl.column("embedding")[0])
    rng = np.random.RandomState(CLUSTER_SEED)
    centers = rng.standard_normal((N_CLUSTERS, dim))
    assign = (vec_ids % N_CLUSTERS).astype(np.int64)
    pts = centers[assign] + CLUSTER_SIGMA * rng.standard_normal((len(vec_ids), dim))
    emb_col = pa.array(
        [row for row in pts.astype(np.float32)], type=pa.list_(pa.float32())
    )
    cols = {name: tbl.column(name) for name in tbl.schema.names}
    cols["embedding"] = emb_col
    pq.write_table(
        pa.table(cols), os.path.join(out, "embeddings.parquet")
    )
    print(f"embeddings: {len(vec_ids)} rows ({N_CLUSTERS} planted clusters, dim {dim})")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    unknown = [a for a in flags if a not in ("--unicode", "--skew", "--clustered")]
    if unknown:
        # A verification tool must fail loudly on a mistyped profile flag —
        # silently building the default profile would "pass" the wrong gate.
        sys.exit(
            f"unknown flag(s): {' '.join(unknown)} (valid: --unicode, --skew, --clustered)"
        )
    unicode_profile = "--unicode" in flags
    skew_profile = "--skew" in flags
    clustered_profile = "--clustered" in flags
    default_name = "fuzz0.01"
    if unicode_profile:
        default_name = "fuzzu0.01"
    elif skew_profile:
        default_name = "fuzzs0.01"
    elif clustered_profile:
        default_name = "fuzzc0.01"
    base = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = (
        args[1]
        if len(args) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".fixtures",
            default_name,
        )
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def emit(table: str, select_sql: str) -> None:
        src = "read_parquet('{}/{}.parquet')".format(base, table)
        con.execute(
            f"COPY ({select_sql.format(src=src)}) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ["region", "nation", "customer", "supplier", "part"]:
        emit(t, "SELECT * FROM {src}")

    if clustered_profile:
        # ONLY embeddings change (isolates failures to vector geometry):
        # the base fixture's vectors are i.i.d. random, so all cosines
        # are ~0.3 and any LSH bucketing admits most of the corpus
        # (SCALE.md §6 documented weakness). Real embedding corpora are
        # CLUSTERED; this profile plants 16 Gaussian clusters (centers
        # seed 7, sigma 0.33 -> intra-cluster pairwise cosine ~0.9,
        # cross-cluster ~0) over the SAME vec_id key set / dim / dtype,
        # so ANN recall and candidate-set selectivity become measurable
        # under realistic geometry while every oracle pair stays valid.
        for t in ["orders", "lineitem", "documents", "events"]:
            emit(t, "SELECT * FROM {src}")
        _emit_clustered_embeddings(base, out)
        print(f"clustered-embedding fixture at {out}")
        return

    if skew_profile:
        # ONLY the user mapping changes (isolates failures to skew):
        # ~30% of events land on the base fixture's smallest user_id,
        # which stays inside the customer key domain so user->customer
        # enrichment joins still resolve
        hot = con.execute(
            f"SELECT min(user_id) FROM read_parquet('{base}/events.parquet')"
        ).fetchone()[0]
        for t in ["orders", "lineitem", "documents", "embeddings"]:
            emit(t, "SELECT * FROM {src}")
        emit(
            "events",
            f"""SELECT * REPLACE (
                  CASE WHEN event_id % 10 < 3 THEN {hot} ELSE user_id END AS user_id)
                FROM {{src}}""",
        )
        print(f"skew fixture at {out} (hot user_id={hot})")
        return

    emit(
        "orders",
        f"""SELECT * REPLACE (round(o_totalprice * {PRICE_SCALE}, 2) AS o_totalprice)
            FROM {{src}}""",
    )
    emit(
        "lineitem",
        f"""SELECT * REPLACE (round(l_extendedprice * {PRICE_SCALE}, 2) AS l_extendedprice)
            FROM {{src}}""",
    )
    emit(
        "events",
        f"""SELECT * REPLACE (
              round(value * {VALUE_SCALE}
                    * (CASE WHEN event_id % 13 = 0 THEN -1 ELSE 1 END), 2) AS value)
            FROM {{src}}""",
    )
    if unicode_profile:
        # multibyte stress: keep row counts/ids; append non-ASCII runs
        # (2-byte Latin, 3-byte CJK, 4-byte emoji) to ~4% of docs as a
        # space-separated token so tokenizers see them as words
        doc_case = """CASE WHEN doc_id % 53 = 0 THEN text || ' café횟집 привет'
                  WHEN doc_id % 53 = 1 THEN text || ' 機械学習 データ'
                  WHEN doc_id % 53 = 2 THEN text || ' naïve🙂über'
                  ELSE text END"""
        emit(
            "documents",
            f"""SELECT * REPLACE (
                 {doc_case} AS text,
                 CAST(length({doc_case}) AS BIGINT) AS n_chars)
               FROM {{src}}""",
        )
    else:
        # doc 0/1: empty and single-char; every 97th: 3 chars; doc 2: a
        # ~100 KB outlier (repeat x300 — web-crawl corpora carry MB-size
        # outliers and shingle/token explosions must absorb them, not
        # OOM or diverge)
        doc_case = """CASE WHEN doc_id = 0 THEN ''
                  WHEN doc_id = 1 THEN substr(text, 1, 1)
                  WHEN doc_id = 2 THEN repeat(text, 300)
                  WHEN doc_id % 97 = 0 THEN substr(text, 1, 3)
                  ELSE text END"""
        emit(
            "documents",
            f"""SELECT * REPLACE (
                 {doc_case} AS text,
                 CAST(length({doc_case}) AS BIGINT) AS n_chars)
               FROM {{src}}""",
        )
    emit(
        "embeddings",
        """SELECT * REPLACE (
             list_transform(embedding,
                            x -> x * CAST(1 + vec_id % 5 AS FLOAT)) AS embedding)
           FROM {src}""",
    )
    print(f"fuzz fixture at {out}")


if __name__ == "__main__":
    main()
