"""Unit-level properties of the bloom-prefiltered anti-join
(`operators/sketches.py`): the sketch may only ever ADD candidates
(false positives), never lose members (false negatives) — so the
composed orphan audit is exact for ANY key distribution.

Complements the oracle gate (which checks the registered query on the
fixture): here the key sets are adversarial — disjoint, identical,
negative, hot-duplicated, and 64-bit-extreme keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.operators.sketches import (
    BLOOM_SEEDS,
    bloom_prefilter_pass,
    bloom_prefiltered_orphan_audit,
)


def _df(spark, name, keys):
    return spark.createDataFrame([(int(k),) for k in keys], f"{name} bigint")


CASES = [
    # (build keys, probe keys)
    ([1, 2, 3], [1, 2, 3]),                      # all members
    ([1, 2, 3], [4, 5, 6]),                      # disjoint
    ([], [1, 2, 3]),                             # empty build: all orphans
    ([7], []),                                   # empty probe
    (list(range(100)), list(range(50, 150))),    # half overlap
    ([-5, -1, 0], [-5, 0, 3]),                   # negative + zero keys
    ([2**62, -(2**62), 1], [2**62, -(2**62), 2]),  # int64 extremes
    ([11] * 1, [11] * 7 + [13] * 3),             # duplicated probe rows
]


@pytest.mark.parametrize("build,probe", CASES)
def test_bloom_no_false_negatives_and_exact_audit(spark, build, probe):
    build_df = _df(spark, "k", build).distinct()
    probe_df = _df(spark, "pk", probe)

    flags = bloom_prefilter_pass(probe_df, "pk", build_df)
    rows = flags.collect()
    # row multiplicity preserved (the three broadcast left joins must
    # not duplicate or drop probe rows)
    assert len(rows) == len(probe)
    members = set(build)
    for r in rows:
        if r.pk in members:
            # NO FALSE NEGATIVES: a member always passes the bloom
            assert r.bloom_pass, f"member {r.pk} failed the bloom"

    audit = bloom_prefiltered_orphan_audit(
        "t", probe_df.select(F.col("pk").alias("fk")), "fk", build_df
    ).collect()[0]
    exact_orphans = sum(1 for k in probe if k not in members)
    assert audit.n_checked == len(probe)
    assert audit.n_orphans == exact_orphans
    assert audit.n_bloom_pruned + audit.n_candidates == len(probe)
    # candidates ⊇ members among probes (false positives allowed,
    # false negatives not)
    n_member_probes = sum(1 for k in probe if k in members)
    assert audit.n_candidates >= n_member_probes
    assert audit.passed == (exact_orphans == 0)


def test_bloom_seeds_are_pairwise_distinct():
    assert len(set(BLOOM_SEEDS)) == len(BLOOM_SEEDS)
