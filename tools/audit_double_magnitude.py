"""Audit: which registered queries emit DOUBLE display columns whose
values approach/exceed 2^53 (the int64/decimal -> double exact range)?

The round-8 fuzz gate caught a cross-engine last-ulp divergence when an
exact >2^53 accumulator was displayed via CAST(x AS DOUBLE)
(stats_two_way_anova_price, SCALE.md 5g.10). This tool closes the
class sweep VERDICT r8 item 5 asks for: instead of eyeballing every
cast site, run EVERY registered query against a fixture and flag any
float64 output cell with |value| >= the threshold — exactly the cells
where a raw cast of an exact value could hash-diverge. Quantized
ratio/statistic columns land far below the threshold by construction,
so survivors are precisely the raw-cast offenders.

Usage: python tools/audit_double_magnitude.py [sf_dir] [threshold]
Default threshold 2^50 (margin 8x below the 2^53 cliff).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_public_data_ingestor_spark.registry import all_queries
from mysql_public_data_ingestor_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".fixtures/fuzz0.01"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0**50
    spark = get_spark("audit_double_magnitude")
    flagged: dict[str, list[str]] = {}
    errors: list[str] = []
    for name, spec in sorted(all_queries().items()):
        try:
            pdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: {e}")
            continue
        hits = []
        for c in pdf.columns:
            if pdf[c].dtype == np.float64:
                mx = pdf[c].abs().max()
                if mx == mx and mx >= threshold:  # NaN-safe
                    hits.append(f"{c} (max |v| = {mx:.6g})")
        if hits:
            flagged[name] = hits
    print(f"\nscanned {len(all_queries())} queries at {sf_dir}, "
          f"threshold {threshold:.6g}")
    for name, hits in flagged.items():
        print(f"FLAG  {name}: {', '.join(hits)}")
    for e in errors:
        print(f"ERR   {e}")
    if not flagged and not errors:
        print("no double display column reaches the threshold")
    return 1 if flagged or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
