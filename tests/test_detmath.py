"""Cross-engine bit-identity of the deterministic fixed-point ln.

The residual hash-flake class this kills: JVM Math.log and DuckDB's
libm ln disagree by 1 ulp on ~3.4% of inputs (measured round 6), so
floor(ln(x)*10^dp + 0.5) could flip between engines on
boundary-adjacent values. det_ln_q uses only correctly-rounded IEEE
ops, so Spark, DuckDB and the pure-Python reference must agree
BIT-FOR-BIT on every input — which is exactly what this test asserts,
on magnitude-stratified random values plus the edge cases and the
regression inputs that exposed two real engine traps during
development (DuckDB vectorized list_reduce mis-evaluation; DECIMAL
literal parsing making L*C exact instead of one double rounding).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_public_data_ingestor_spark.functions.detmath import (
    det_ln_q,
    ref_det_ln_q,
    sql_det_ln_steps,
)

# values whose L*C product lands exactly on a representable .5 — the
# FMA/DECIMAL trap regressions found in round 6
_REGRESSIONS = [
    65628828.13535668,
    1.8872961906576852e-296,
    4.1514646099658096e-150,
    2.178789337697727e-291,
    4.904909179018387e-301,
    1.6198779324411348e-283,
]

_EDGES = [1.0, 2.0, 0.5, 2.0**-1000, 2.0**1000, 1.0000000001,
          0.9999999999, 1e308, 1e-308, -1.0, 0.0]


def _corpus() -> np.ndarray:
    rng = np.random.default_rng(1234)
    return np.concatenate(
        [
            rng.uniform(1e-12, 1.0, 30_000),
            rng.uniform(1.0, 1e9, 30_000),
            np.exp(rng.uniform(-700, 700, 30_000)),
            rng.integers(1, 10**9, 20_000).astype(np.float64)
            / rng.integers(1, 10**9, 20_000).astype(np.float64),
            np.array(_REGRESSIONS + _EDGES),
        ]
    )


@pytest.mark.parametrize("dp", [6, 9])
def test_det_ln_q_bit_identical_across_engines(spark, dp):
    duckdb = pytest.importorskip("duckdb")
    vals = _corpus()
    pdf = pd.DataFrame({"x": vals, "i": np.arange(len(vals))})
    sdf = spark.createDataFrame(pdf)
    srows = sdf.select("i", det_ln_q(F.col("x"), dp).alias("q")).collect()
    s = {r.i: r.q for r in srows}
    con = duckdb.connect()
    con.register("pdf", pdf)
    sql = (
        f"WITH base AS (SELECT * FROM pdf), "
        f"{sql_det_ln_steps('base', 'x', 'q', dp)} "
        f"SELECT i, q FROM q_rel ORDER BY i"
    )
    d = con.execute(sql).df()
    mism = [
        int(r.i)
        for r in d.itertuples()
        if (None if pd.isna(r.q) else int(r.q)) != s[r.i]
    ]
    assert mism == [], f"{len(mism)} cross-engine mismatches, e.g. x={vals[mism[0]]!r}"


def test_det_ln_q_matches_python_reference(spark):
    vals = _corpus()[::37]  # sample for speed; ref is pure Python
    pdf = pd.DataFrame({"x": vals, "i": np.arange(len(vals))})
    srows = (
        spark.createDataFrame(pdf)
        .select("i", det_ln_q(F.col("x"), 6).alias("q"))
        .collect()
    )
    for r in srows:
        assert r.q == ref_det_ln_q(float(vals[r.i]), 6), vals[r.i]


def test_det_ln_q_accuracy():
    import math

    rng = np.random.default_rng(99)
    for x in np.exp(rng.uniform(-200, 200, 5000)):
        q = ref_det_ln_q(float(x), 6)
        assert abs(q / 1e6 - math.log(x)) < 1.1e-6, x
    assert ref_det_ln_q(0.0, 6) is None
    assert ref_det_ln_q(-3.0, 6) is None
