"""Build a larger fixture by replicating an existing sf directory with
referential-integrity-preserving key offsets — a 10x scale-up of
sf0.1 approximates sf1 for SCALING measurements (SCALE.md 5b).

Replica i (i = 0..factor-1) offsets every entity key by
i * (max_key + 1) for that entity, and every foreign key by the SAME
entity offset, so joins land exactly as in the base fixture. Dimension
tables (region, nation) stay fixed, like TPC-H. Text/embedding payloads
repeat verbatim — duplicate-heavy corpora stress the dedup/similarity
operators harder, not less.

Usage: python tools/make_scale_fixture.py [base_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

# entity -> (owning table, key column); every other column listed here
# is a foreign key remapped with the owner's offset
ENTITIES = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ordr": ("orders", "o_orderkey"),
    "evnt": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

# table -> {column: entity}
REMAP = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ordr", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ordr", "l_partkey": "part", "l_suppkey": "supp"},
    # user_id is drawn from the CUSTOMER key domain in the base
    # fixtures (every user_id is a c_custkey; streaming/windows.py
    # joins events.user_id == c_custkey) — so replicas must offset it
    # by the customer stride, not an independent user stride, or the
    # dimension-enrichment join pairs replica-i events with replica-0
    # customers (and yields NULLs once user stride * factor exceeds
    # max c_custkey)
    "events": {"event_id": "evnt", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

COPY_AS_IS = ["region", "nation"]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", "sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    offsets: dict[str, int] = {}
    for ent, (table, col) in ENTITIES.items():
        mx = con.execute(
            f"SELECT max({col}) FROM read_parquet('{base}/{table}.parquet')"
        ).fetchone()[0]
        offsets[ent] = int(mx) + 1

    for table in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{base}/{table}.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")

    for table, remap in REMAP.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{base}/{table}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i * {offsets[remap[c]]} AS {c}" if c in remap else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{base}/{table}.parquet'), "
            f"(SELECT unnest(range({factor})) AS i) r "
            f"ORDER BY i) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows (x{factor})")


if __name__ == "__main__":
    main()
