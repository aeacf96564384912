"""Round-5 queue gate: every queued-but-unregistered operator in
``operators/roundfive.py`` must already pass the SAME canon/compare the
driver's correctness gate uses — so activating them next round is a
rename, not new risk.

Also pins the queue's isolation: importing the module must NOT touch the
live registry (the round-4 driver window is exactly 50 unverified
queries; a stray registration would push one out).
"""

from __future__ import annotations

import pytest

from mysql_public_data_ingestor_spark.operators import roundfive
from tools.check_correctness import canon, compare, duck_connection


def test_queue_does_not_pollute_registry():
    from mysql_public_data_ingestor_spark import registry

    registered = set(registry._REGISTRY)
    queued = {name for name, *_ in roundfive.QUEUE}
    assert queued, "queue unexpectedly empty"
    assert not (queued & registered), (
        "queued names leaked into the live registry — this breaks the "
        f"round-4 driver window: {queued & registered}"
    )


def test_queue_entries_well_formed():
    seen = set()
    for name, fn, oracle, doc in roundfive.QUEUE:
        assert name not in seen, f"duplicate queue name {name}"
        seen.add(name)
        assert callable(fn)
        assert isinstance(oracle, str) and oracle.strip()
        assert doc.strip(), f"{name} missing docstring"


@pytest.mark.parametrize(
    "entry", roundfive.QUEUE, ids=[name for name, *_ in roundfive.QUEUE]
)
def test_queued_query_matches_oracle(spark, sf_dir, entry):
    name, fn, oracle, _doc = entry
    sdf = canon(fn(spark, sf_dir).toPandas())
    con = duck_connection(sf_dir)
    try:
        odf = canon(con.execute(oracle).fetchdf())
    finally:
        con.close()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"
