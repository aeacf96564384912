"""Round-9 banked-queue gate: every operator in
``operators/roundnine.py`` must pass the SAME canon/compare the
driver's correctness gate uses and meet the registry-wide plan bars
NOW — activation in round 9 is then a pure registration flip, exactly
the round-4/5 pattern (``operators/roundfive.py``).
"""

from __future__ import annotations

import pytest

from mysql_public_data_ingestor_spark.operators import roundnine
from tools.check_correctness import compare, duck_connection


def test_queue_is_registered_with_oracles():
    """Activation contract (VERDICT r8 item 1): all 22 queue names are
    live registry entries, each carrying its oracle, and a repeat
    activate() is a no-op rather than a duplicate-name error."""
    from mysql_public_data_ingestor_spark import registry

    registry._ensure_loaded()
    queued = {name for name, *_ in roundnine.QUEUE}
    assert queued, "queue unexpectedly empty"
    missing = queued - set(registry._REGISTRY)
    assert not missing, f"queued names not registered: {missing}"
    no_oracle = {n for n in queued if registry._REGISTRY[n].oracle is None}
    assert not no_oracle, f"registered without oracle: {no_oracle}"
    roundnine.activate()  # idempotent — must not raise


def test_window_budget_holds_round9():
    """1 (recall-audit truth-side re-verify) + 22 (queue activation)
    + new round-9 registrations <= 50 — everything unverified stays
    inside the driver's evaluation window."""
    from mysql_public_data_ingestor_spark import registry

    names = list(registry.all_queries().keys())
    hv, rv = registry._verified_names()
    unverified = [n for n in names if n not in hv and n not in rv]
    assert len(unverified) <= 50, len(unverified)
    head = set(names[:50])
    assert set(unverified) <= head


def test_queue_heads_driver_window():
    """The never-driver-verified batch must occupy the head of the
    evaluation order so the round-9 window covers it (evidence-relative:
    once CORRECTNESS_r09 lands with green rows, these names retire from
    the head and this asserts nothing about their position)."""
    from mysql_public_data_ingestor_spark import registry

    hash_verified, _rows = registry._verified_names()
    queued = [name for name, *_ in roundnine.QUEUE]
    unverified = [n for n in queued if n not in hash_verified]
    window = list(registry.all_queries())[:50]
    stranded = set(unverified) - set(window)
    assert not stranded, f"unverified batch names outside the 50-slot window: {stranded}"


def test_queue_entries_well_formed():
    seen = set()
    for name, fn, oracle, doc in roundnine.QUEUE:
        assert name not in seen, f"duplicate queue name {name}"
        seen.add(name)
        assert callable(fn)
        assert isinstance(oracle, str) and oracle.strip()
        assert doc.strip(), f"{name} missing docstring"


@pytest.mark.parametrize(
    "entry", roundnine.QUEUE, ids=[name for name, *_ in roundnine.QUEUE]
)
def test_queued_query_matches_oracle(spark, sf_dir, entry):
    # RAW frames into compare() (it canons internally): pre-canoning
    # here once masked an int32-vs-int64 oracle dtype gap that the
    # registry-wide gate (which compares raw) then caught at
    # activation time (graph_rich_club_coefficient, round 9).
    name, fn, oracle, _doc = entry
    sdf = fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        odf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


# Queued ops must meet the same scale bar as the registry BEFORE
# activation — replicate the registry-wide plan sweeps over the queue.
#
# stats_cvm_two_sample: the ordered ECDF pass runs over the POST-
#   AGGREGATION <= 50-distinct-quantity domain, not rows.
# stats_page_hinkley_orders: prefix sum + running min over the POST-
#   AGGREGATION calendar-day series (~2.4k rows at any corpus size).
# ml_brier_decomposition: the total-recovery window runs over the 10
#   decile rows of the final aggregate.
# stats_ansari_bradley_quantity: same bounded-domain shape as CvM —
#   doubled mid-ranks over the <= 50 pooled distinct quantity values.
# relational_skyline_pareto: the frontier cumulative runs over the
#   collapsed DISTINCT price-cents curve of the dimension table
#   (value-domain-bounded), never over part rows.
# ml_youden_optimal_threshold: ROC cumulative over the POST-
#   AGGREGATION <= 10001-value score grid; top-1 via TakeOrdered.
# (agg_top_value_share left this list in round 10: its ordered pass is
#   now a two-pass boundary-bin refinement with max_by final
#   aggregates — no SinglePartition window remains. SCALE §5i.3.)
QUEUE_SP_ALLOWLIST = {
    "stats_cvm_two_sample",
    "stats_page_hinkley_orders",
    "ml_brier_decomposition",
    "stats_ansari_bradley_quantity",
    "relational_skyline_pareto",
    "ml_youden_optimal_threshold",
    # layout_serpentine_shard_balance: the share window runs over the
    # 8-row per-shard aggregate output.
    "layout_serpentine_shard_balance",
}


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
    for name, fn, _oracle, _doc in roundnine.QUEUE:
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
    for name, fn, _oracle, _doc in roundnine.QUEUE:
        try:
            assert_no_cartesian(fn(spark, sf_dir))
        except AssertionError:
            offenders.append(name)
    assert not offenders, offenders


def test_activate_registers_cleanly_in_subprocess():
    """Prove now — in a subprocess, so the live registry stays clean —
    that round-9 activation will register every queued name without
    collisions and the window machinery still orders them first."""
    import subprocess
    import sys

    code = (
        "from mysql_public_data_ingestor_spark import registry\n"
        "registry._ensure_loaded()\n"
        "from mysql_public_data_ingestor_spark.operators import roundnine\n"
        "roundnine.activate()\n"
        "roundnine.activate()\n"  # idempotent
        "names = set(registry._REGISTRY)\n"
        "queued = {n for n, *_ in roundnine.QUEUE}\n"
        "missing = queued - names\n"
        "assert not missing, f'not registered: {missing}'\n"
        "no_oracle = {n for n in queued if registry._REGISTRY[n].oracle is None}\n"
        "assert not no_oracle, f'registered without oracle: {no_oracle}'\n"
        "print('OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo"
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
