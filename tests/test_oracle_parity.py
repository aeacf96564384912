"""DuckDB-oracle parity for every registered query (the driver's t2
gate, run locally at sf0.001 for speed — tools/check_correctness.py
runs the same comparison at any sf)."""

from __future__ import annotations

import duckdb
import pytest

from mysql_public_data_ingestor_spark.registry import all_queries
from tools.check_correctness import compare, duck_connection

SPECS = all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck: duckdb.DuckDBPyConnection):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert sdf.columns.size > 0
        return
    odf = duck.execute(spec.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, "\n".join(problems)


def test_approx_count_distinct_within_tolerance(spark, sf_dir, duck):
    """rows-only sketch queries still get a sanity bound: HLL estimate
    within 5% of the exact count."""
    approx = {
        r.o_orderpriority: r.approx_customers
        for r in SPECS["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT o_orderpriority, count(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(0.05 * exact[k], 2), (k, est, exact[k])


def test_approx_percentiles_within_tolerance(spark, sf_dir, duck):
    rows = SPECS["percentiles_approx"].fn(spark, sf_dir).collect()
    for r in rows:
        p50, p90, p99 = r.p50, r.p90, r.p99
        ex = duck.execute(
            "SELECT quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) FROM lineitem "
            "WHERE l_returnflag = ?",
            [r.l_returnflag],
        ).fetchone()[0]
        for est, exact in zip((p50, p90, p99), ex):
            assert abs(est - exact) / exact < 0.02, (r.l_returnflag, est, exact)


def test_stratified_sample_within_envelope(spark, sf_dir, duck):
    """sampleBy fractions land within a generous binomial envelope."""
    fractions = {"en": 0.5, "fr": 0.3, "de": 0.3, "es": 0.3, "zh": 0.3}
    got = {r.lang: r.n_sampled for r in SPECS["sample_stratified"].fn(spark, sf_dir).collect()}
    totals = dict(duck.execute("SELECT lang, count(*) FROM documents GROUP BY 1").fetchall())
    for lang, frac in fractions.items():
        n, p = totals[lang], frac
        mean, sd = n * p, (n * p * (1 - p)) ** 0.5
        assert abs(got.get(lang, 0) - mean) <= 5 * sd, (lang, got.get(lang), mean, sd)
