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
