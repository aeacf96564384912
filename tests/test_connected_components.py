"""connected_components: pointer-jumping label propagation.

The round-1 implementation capped min-label propagation at 10 rounds and
silently returned non-converged labels for any component with diameter
> 10. These tests plant exactly that shape (long chains) and assert
correct clusters within the O(log n) round bound.
"""

from __future__ import annotations

import pytest

from mysql_public_data_ingestor_spark.operators.dedup import connected_components


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_diameter_20_chain_single_cluster(spark):
    """A 21-node path graph (diameter 20) — the planted failure mode of
    a fixed-10-round cap — must collapse to one cluster labeled 0."""
    chain = [(i, i + 1) for i in range(20)]
    got = {
        r.doc_id: r.cluster_id for r in connected_components(_pairs_df(spark, chain)).collect()
    }
    assert got == {i: 0 for i in range(21)}


def test_long_chain_plus_islands(spark):
    """Diameter-60 chain with offset ids + separate 2-cliques: each
    component gets its own min-id label, none bleed together."""
    chain = [(100 + i, 100 + i + 1) for i in range(60)]
    islands = [(5, 7), (7, 9), (1000, 1001)]
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(_pairs_df(spark, chain + islands)).collect()
    }
    assert all(got[100 + i] == 100 for i in range(61))
    assert got[5] == got[7] == got[9] == 5
    assert got[1000] == got[1001] == 1000


def test_empty_pairs(spark):
    got = connected_components(_pairs_df(spark, [])).collect()
    assert got == []


def test_reversed_chain_converges(spark):
    """Labels must flow against edge direction too (symmetrized graph):
    chain listed high->low with the minimum at the far end."""
    chain = [(i + 1, i) for i in range(30)]
    got = {
        r.doc_id: r.cluster_id for r in connected_components(_pairs_df(spark, chain)).collect()
    }
    assert set(got.values()) == {0}
