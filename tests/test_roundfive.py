"""Round-5 batch gate: every operator in ``operators/roundfive.py``
must pass the SAME canon/compare the driver's correctness gate uses,
and — now that round 5 activated the queue — must be REGISTERED with
its oracle and sit at the front of the driver's evaluation window.
"""

from __future__ import annotations

import pytest

from mysql_public_data_ingestor_spark.operators import roundfive
from tools.check_correctness import canon, compare, duck_connection


def test_queue_is_registered_with_oracles():
    """Activation contract (VERDICT r4 item 1): all 23 batch names are
    live registry entries, each carrying its oracle, and a repeat
    activate() is a no-op rather than a duplicate-name error."""
    from mysql_public_data_ingestor_spark import registry

    registry._ensure_loaded()
    queued = {name for name, *_ in roundfive.QUEUE}
    assert queued, "queue unexpectedly empty"
    missing = queued - set(registry._REGISTRY)
    assert not missing, f"queued names not registered: {missing}"
    no_oracle = {n for n in queued if registry._REGISTRY[n].oracle is None}
    assert not no_oracle, f"registered without oracle: {no_oracle}"
    roundfive.activate()  # idempotent — must not raise


def test_queue_heads_driver_window():
    """The never-driver-verified batch must occupy the head of the
    evaluation order so the round-5 window covers it (evidence-relative:
    once CORRECTNESS_r05 lands with green rows, these names retire from
    the head and this asserts nothing about their position)."""
    from mysql_public_data_ingestor_spark import registry

    hash_verified, _rows = registry._verified_names()
    queued = [name for name, *_ in roundfive.QUEUE]
    unverified = [n for n in queued if n not in hash_verified]
    window = list(registry.all_queries())[:50]
    stranded = set(unverified) - set(window)
    assert not stranded, f"unverified batch names outside the 50-slot window: {stranded}"


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
