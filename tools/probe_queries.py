"""Warm per-query re-probe: noop-sink timing, min-of-N, one session.

Usage: python tools/probe_queries.py [-n N] <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

The same methodology as bench.py (noop sink, warm minimum) for
targeted before/after comparisons during optimization rounds without
re-running the full registry.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_public_data_ingestor_spark.registry import all_queries
from mysql_public_data_ingestor_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_queries")
    specs = all_queries()
    # same warmup as bench.py
    for _ in range(2):
        specs["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    for name in args:
        spark.sparkContext.setJobDescription(f"probe: {name}")
        fn = specs[name].fn
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: min {min(runs):.2f}  runs {' '.join(f'{r:.2f}' for r in runs)}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
