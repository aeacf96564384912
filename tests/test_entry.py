"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_queries_and_oracles_consistent(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # every callable takes (spark, sf_dir)
    for fn in qs.values():
        assert callable(fn)


def test_evaluation_window_prioritizes_unverified():
    """all_queries() must order queries without a prior external
    correctness row before ones already hash-verified in any
    CORRECTNESS_r*.json — the evaluator checks a fixed-size prefix, so
    verified queries yielding their slots is what grows coverage
    round over round. A rows-only row must not retire a query that has
    since gained an oracle."""
    import json

    from mysql_public_data_ingestor_spark.registry import all_queries

    with open("CORRECTNESS_r01.json") as f:
        r01 = json.load(f)
    hash_verified = {n for n, r in r01.items() if r.get("hash_match") is True}
    rows_verified = {
        n for n, r in r01.items()
        if r.get("err") == "no_oracle" and r.get("spark_rows") is not None
    }
    names = list(all_queries())
    specs = all_queries()
    first_unverified = [
        n for n in names
        if n not in hash_verified
        and not (specs[n].oracle is None and n in rows_verified)
    ]
    # every never-hash-verified query precedes every hash-verified one
    last_unverified_pos = max(names.index(n) for n in first_unverified)
    first_verified_pos = min(names.index(n) for n in hash_verified if n in names)
    assert last_unverified_pos < first_verified_pos, (
        names[first_verified_pos], names[last_unverified_pos])
    # rows-only in r01 but oracle-paired now -> treated as unverified
    assert specs["multimodal_decode_stub"].oracle is not None
    assert names.index("multimodal_decode_stub") < first_verified_pos
