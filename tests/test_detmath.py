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


# ---------------------------------------------------------------------------
# det_pow_int (round 14): deterministic integer power
# ---------------------------------------------------------------------------


def _pow_corpus():
    rng = np.random.default_rng(4242)
    b = np.concatenate(
        [
            rng.uniform(0.0, 1.0, 20_000),
            1.0 - np.exp(rng.uniform(-30, 0, 20_000)),  # near-1 bases (Chao-Shen regime)
            rng.uniform(1.0, 2.0, 5_000),
            np.array([0.0, 1.0, 0.5, 1.0 - 1e-12, 2.0**-500]),
        ]
    )
    n = np.concatenate(
        [
            rng.integers(0, 10**6, 40_000),
            rng.integers(10**6, 2**48 - 1, 5_000),
            np.array([0, 1, 2, 3, 2**48 - 1]),
        ]
    ).astype(np.int64)
    return b, n


def test_det_pow_int_bit_identical_across_engines(spark):
    from mysql_public_data_ingestor_spark.functions.detmath import (
        det_pow_int,
        sql_det_pow_steps,
    )

    duckdb = pytest.importorskip("duckdb")
    b, n = _pow_corpus()
    pdf = pd.DataFrame({"b": b, "n": n, "i": np.arange(len(b))})
    sdf = spark.createDataFrame(pdf)
    srows = sdf.select(
        "i", det_pow_int(F.col("b"), F.col("n")).alias("p")
    ).collect()
    s = {r.i: r.p for r in srows}
    con = duckdb.connect()
    con.register("pdf", pdf)
    sql = (
        f"WITH base AS (SELECT * FROM pdf), "
        f"{sql_det_pow_steps('base', 'b', 'n', 'p')} "
        f"SELECT i, p FROM p_rel ORDER BY i"
    )
    d = con.execute(sql).df()
    mism = [
        int(r.i)
        for r in d.itertuples()
        if (r.p != s[r.i] and not (pd.isna(r.p) and s[r.i] is None))
    ]
    assert mism == [], (
        f"{len(mism)} cross-engine mismatches, e.g. "
        f"b={b[mism[0]]!r} n={n[mism[0]]!r}" if mism else ""
    )


def test_det_pow_int_matches_python_reference(spark):
    from mysql_public_data_ingestor_spark.functions.detmath import (
        det_pow_int,
        ref_det_pow_int,
    )

    b, n = _pow_corpus()
    b, n = b[::23], n[::23]
    pdf = pd.DataFrame({"b": b, "n": n, "i": np.arange(len(b))})
    srows = (
        spark.createDataFrame(pdf)
        .select("i", det_pow_int(F.col("b"), F.col("n")).alias("p"))
        .collect()
    )
    for r in srows:
        assert r.p == ref_det_pow_int(float(b[r.i]), int(n[r.i])), (b[r.i], n[r.i])


def test_det_pow_int_accuracy():
    from mysql_public_data_ingestor_spark.functions.detmath import ref_det_pow_int

    rng = np.random.default_rng(7)
    for _ in range(2000):
        b = float(rng.uniform(0.0, 1.0))
        n = int(rng.integers(0, 10**5))
        exact = b**n
        got = ref_det_pow_int(b, n)
        if exact > 1e-300:
            assert abs(got / exact - 1.0) < 1e-10, (b, n)
    assert ref_det_pow_int(0.0, 0) == 1.0
    assert ref_det_pow_int(0.0, 5) == 0.0
