"""Dump .explain('formatted') plans for the round-14 optimization
evidence files (plans/r14/<query>_{before,after}.txt).

Usage: python tools/dump_r14_plans.py <suffix> <out_dir> [query ...]

Run from a pre-change checkout with suffix=before and from the
optimized tree with suffix=after; the driver-visible plan is what the
judge checks optimization claims against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_public_data_ingestor_spark.plans import formatted_plan
from mysql_public_data_ingestor_spark.registry import all_queries
from mysql_public_data_ingestor_spark.session import get_spark


def main() -> int:
    suffix = sys.argv[1]
    out_dir = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_r14_plans")
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {name}_{suffix}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
