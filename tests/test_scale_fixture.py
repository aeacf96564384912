"""tools/make_scale_fixture.py: replicated fixtures must preserve
referential integrity (every foreign key resolves) and multiply row
counts exactly — otherwise scale measurements run on broken joins."""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfx")
    subprocess.run(
        [sys.executable, "tools/make_scale_fixture.py", "/root/testdata/sf0.001", str(out), "3"],
        check=True,
        capture_output=True,
    )
    return str(out)


def test_row_counts_multiply(scaled):
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        base = con.execute(
            f"SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        ).fetchone()[0]
        new = con.execute(
            f"SELECT count(*) FROM read_parquet('{scaled}/{t}.parquet')"
        ).fetchone()[0]
        assert new == 3 * base, (t, base, new)
    for t in ["region", "nation"]:
        base = con.execute(
            f"SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        ).fetchone()[0]
        new = con.execute(
            f"SELECT count(*) FROM read_parquet('{scaled}/{t}.parquet')"
        ).fetchone()[0]
        assert new == base, t


def test_foreign_keys_resolve(scaled):
    con = duckdb.connect()
    checks = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        # user_id lives in the customer-key domain (the streaming
        # enrichment join is events.user_id == c_custkey) — replicas
        # must offset it with the CUSTOMER stride
        ("events", "user_id", "customer", "c_custkey"),
    ]
    for child, fk, parent, pk in checks:
        orphans = con.execute(
            f"SELECT count(*) FROM read_parquet('{scaled}/{child}.parquet') c "
            f"WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{scaled}/{parent}.parquet') p "
            f"WHERE p.{pk} = c.{fk})"
        ).fetchone()[0]
        assert orphans == 0, (child, fk, orphans)


def test_keys_unique(scaled):
    con = duckdb.connect()
    for t, k in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")]:
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {k}) FROM read_parquet('{scaled}/{t}.parquet')"
        ).fetchone()
        assert n == d, (t, n, d)


def test_user_ids_stay_replica_aligned(scaled):
    """Each replica's events must reference its OWN replica's
    customers: the number of distinct user_ids multiplies by the
    factor (independent user-stride remapping would collapse them
    onto replica-0's customers or orphan them entirely)."""
    con = duckdb.connect()
    base = con.execute(
        "SELECT count(DISTINCT user_id) FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    new = con.execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{scaled}/events.parquet')"
    ).fetchone()[0]
    assert new == 3 * base, (base, new)
