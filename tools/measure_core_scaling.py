"""Core-count scaling measurement over a fixed query list at a given
fixture (VERDICT r14 item 6: at sf0.1 the whole suite is per-query
overhead-bound — 8-core/32-core ratio 0.98 — so parallel scaling must
be demonstrated on a larger fixture where compute dominates).

Runs the bench methodology (noop sink, min-of-2 warm, one session) for
the named queries against SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] and writes ONE JSON object to the output
path: {"cpus": N, "sf_dir": ..., "queries": {name: sec}, "queries_cold":
{...}, "derivation_builds": {...}}.

Invoke once per core count and merge the results into BENCH_X10.json:

  SPARK_GRAFT_SF_DIR=/tmp/sf1.0 SPARK_GRAFT_CPUS=32 \
      python tools/measure_core_scaling.py /tmp/x10_c32.json q1 q2 ...
  SPARK_GRAFT_SF_DIR=/tmp/sf1.0 SPARK_GRAFT_CPUS=8 \
      python tools/measure_core_scaling.py /tmp/x10_c8.json q1 q2 ...
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_public_data_ingestor_spark import warehouse
from mysql_public_data_ingestor_spark.registry import all_queries
from mysql_public_data_ingestor_spark.session import default_parallelism, get_spark


def main() -> int:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure_core_scaling")
    specs = all_queries()
    # bench.py's warmup: JIT the parquet/codegen paths and the Python
    # workers so the first timed query isn't paying one-time costs
    for _ in range(2):
        specs["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:
        gc.collect()
        spark.sparkContext.setJobDescription(f"core-scaling: {name}")
        fn = specs[name].fn
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        cold[name] = round(runs[0], 3)
        timings[name] = round(min(runs), 3)
        print(f"{name}: {timings[name]}", file=sys.stderr, flush=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "cpus": default_parallelism(),
                "sf_dir": sf_dir,
                "timing": "min_of_2_runs",
                "queries": timings,
                "queries_cold": cold,
                "derivation_builds": {
                    k: round(v, 3) for k, v in warehouse.BUILD_SECONDS.items()
                },
            },
            f,
            indent=1,
        )
    print(out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
