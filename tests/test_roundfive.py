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


# Queued ops must meet the same scale bar as the registry BEFORE
# activation — replicate the registry-wide plan sweeps over the queue.

# agg_topk_mergeable: the global re-rank window runs over the merged
# per-shard partials (<= shards*k = 80 rows by construction) — a
# constant-size merge stage like diag_key_skew_profile's, not a
# data-scaled single-reducer.
QUEUE_SP_ALLOWLIST = {"agg_topk_mergeable"}


def _sp_consumers(plan: str) -> list[str]:
    import re

    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        if "REPARTITION_BY_NUM" in line:
            continue
        for j in range(i - 1, -1, -1):
            m = re.match(r"\s*[:+\-\s]*([A-Za-z]+)", lines[j])
            if m and m.group(1) != "Exchange":
                out.append(m.group(1))
                break
    return out


def test_queue_single_partition_only_feeds_final_aggregates(spark, sf_dir):
    from mysql_public_data_ingestor_spark.plans import physical_plan

    offenders = {}
    for name, fn, _oracle, _doc in roundfive.QUEUE:
        if name in QUEUE_SP_ALLOWLIST:
            continue
        plan = physical_plan(fn(spark, sf_dir))
        bad = [
            c
            for c in _sp_consumers(plan)
            if c not in ("HashAggregate", "ObjectHashAggregate", "SortAggregate")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_queue_no_cartesian_products(spark, sf_dir):
    from mysql_public_data_ingestor_spark.plans import assert_no_cartesian

    offenders = []
    for name, fn, _oracle, _doc in roundfive.QUEUE:
        try:
            assert_no_cartesian(fn(spark, sf_dir))
        except AssertionError:
            offenders.append(name)
    assert not offenders, offenders


def test_activate_registers_cleanly_in_subprocess():
    """Round 5 flips the queue on via roundfive.activate(); prove now —
    in a subprocess, so the live registry stays clean — that activation
    registers every queued name without collisions and that the
    evaluation-order machinery still works afterward."""
    import subprocess
    import sys

    code = (
        "from mysql_public_data_ingestor_spark.operators import roundfive\n"
        "from mysql_public_data_ingestor_spark import registry\n"
        "registry._ensure_loaded()\n"
        "roundfive.activate()\n"
        "names = set(registry.all_queries())\n"
        "queued = {n for n, *_ in roundfive.QUEUE}\n"
        "missing = queued - names\n"
        "assert not missing, f'not registered: {missing}'\n"
        "oracles = registry.oracle_sql()\n"
        "assert queued <= set(oracles), 'queued op lost its oracle'\n"
        "print('ACTIVATED', len(queued))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo"
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ACTIVATED" in out.stdout
