"""Measure banded-LSH ANN quality: recall@k vs exact brute force AND
candidate-set selectivity, across band/row geometries.

The round-3 verdict documented that on the i.i.d.-random embedding
fixture the (16 bands x 3 rows) geometry admits ~the whole corpus as
candidates (recall is trivially high, selectivity is the casualty).
Real embedding corpora are clustered; this tool quantifies both metrics
on any fixture — in particular the planted-cluster profile built by
``make_fuzz_fixture.py --clustered`` — so the geometry can be tuned on
realistic data: more rows per band sharpens buckets (fewer candidates),
more bands recovers recall.

Usage: python tools/measure_ann.py [sf_dir] [bands,rows ...]
Default geometries: 16,3 (registered default) and 8,8 (selective).
Prints one JSON line per geometry.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_public_data_ingestor_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    ann_lsh_candidates_and_topk,
)
from mysql_public_data_ingestor_spark.registry import all_queries
from mysql_public_data_ingestor_spark.session import get_spark
from mysql_public_data_ingestor_spark.tables import Tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    geoms = [tuple(int(x) for x in g.split(",")) for g in sys.argv[2:]] or [
        (16, 3),
        (8, 8),
    ]
    spark = get_spark("measure-ann")
    t = Tables(spark, sf_dir)
    n_corpus = t.embeddings.count()

    truth_rows = all_queries()["knn_brute_cosine"].fn(spark, sf_dir).collect()
    truth: dict[int, set[int]] = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    for n_bands, n_rows in geoms:
        cands, topk = ann_lsh_candidates_and_topk(
            t.embeddings, n_bands=n_bands, n_rows=n_rows
        )
        n_cands = cands.count()
        got: dict[int, set[int]] = {}
        for r in topk.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        total = sum(len(s) for s in truth.values())
        frac = n_cands / (N_QUERIES * (n_corpus - 1))
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "bands": n_bands,
                    "rows": n_rows,
                    "n_corpus": n_corpus,
                    "n_queries": N_QUERIES,
                    "top_k": TOP_K,
                    "n_candidates": n_cands,
                    "candidate_fraction": round(frac, 4),
                    "recall_at_k": round(hits / total, 4) if total else None,
                }
            )
        )


if __name__ == "__main__":
    main()
