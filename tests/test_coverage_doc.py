"""COVERAGE.md completeness gate (VERDICT r12 item 4): the header
promises a name-by-name map of the registered query surface; round 12
found 28 registered names absent. This check makes the promise
executable so the gap cannot silently reopen — every ``queries()``
name must appear verbatim somewhere in COVERAGE.md."""

import os

from mysql_public_data_ingestor_spark.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_registered_query_named_in_coverage_md():
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        cov = f.read()
    missing = sorted(n for n in all_queries() if n not in cov)
    assert not missing, (
        f"{len(missing)} registered queries missing from COVERAGE.md: "
        f"{missing}"
    )
