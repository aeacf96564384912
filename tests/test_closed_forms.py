"""Independent-solver anchors for hand-derived closed forms
(VERDICT r10 item 6).

The §5i.11 Granger bug proved the triple-replication failure mode: a
derivation error hand-typed identically into the Spark plan, the SQL
oracle twin AND a same-formula Python replica passes every parity gate.
The fix is an anchor that CANNOT share the derivation — numpy's own
solvers on the same extracted data.

Grep-able inventory of hand-derived closed forms and their anchors
(each line: operator — formula class — anchor):

- stats_corr_price_quantity          — 2-var Pearson r            — np.corrcoef (here)
- stats_linear_regression            — 2-var OLS slope/icept/R2   — np.polyfit/np.corrcoef (here)
- stats_partial_correlation_price    — Pearson r triple + partial — np.corrcoef (test_roundnine2)
- text_heaps_law_fit                 — log-log OLS                — np.polyfit (test_roundnine2)
- stats_chow_test_break /
  events_its_segmented_regression    — integer Cramer 2x2 solve   — np.linalg.lstsq
                                        (test_roundten3::test_ols_coeffs_match_numpy)
- events_bass_diffusion_fit          — 3-var Cramer solve          — np.linalg.solve (test_roundeleven)
- events_granger_lag1_test           — 3-var Cramer solve          — np.linalg.solve (test_roundeleven)
- events_absorbing_markov_steps      — 4x4 determinant (_perm_terms
                                        shared Spark/SQL generator) — np.linalg.solve (test_roundeleven)
- stats_gumbel_daily_max_fit /
  corpus_doclen_lognormal_fit        — moment closed forms          — replica re-derives from raw
                                        moments (test_roundnine2); no
                                        matrix solve involved
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mysql_public_data_ingestor_spark.operators import stats
from mysql_public_data_ingestor_spark.tables import Tables


@pytest.fixture(scope="module")
def lineitem_q4(spark, sf_dir):
    """(returnflag, x, y) with the ops' own scale-4 quantization applied,
    so the anchor sees exactly the numbers the sufficient sums fold."""
    pdf = (
        Tables(spark, sf_dir)
        .lineitem.select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    q4 = lambda v: math.floor(v * 1e4 + 0.5) / 1e4  # noqa: E731
    out = {}
    for flag, grp in pdf.groupby("l_returnflag"):
        x = np.array([q4(v) for v in grp["l_quantity"]])
        y = np.array([q4(v) for v in grp["l_extendedprice"]])
        out[flag] = (x, y)
    return out


def test_corr_matches_numpy(spark, sf_dir, lineitem_q4):
    got = {
        r.l_returnflag: r.corr_qty_price
        for r in stats.stats_corr_price_quantity(spark, sf_dir).collect()
    }
    assert set(got) == set(lineitem_q4)
    for flag, (x, y) in lineitem_q4.items():
        # the op quantizes the PRODUCTS at scale 4 too; the residual vs
        # numpy-on-q4-values is bounded by n*5e-5 per sufficient sum,
        # far below 1e-4 of a correlation at these group sizes
        assert abs(got[flag] - np.corrcoef(x, y)[0, 1]) < 1e-4, flag


def test_linear_regression_matches_numpy(spark, sf_dir, lineitem_q4):
    got = {
        r.l_returnflag: (r.slope, r.intercept, r.r2)
        for r in stats.stats_linear_regression(spark, sf_dir).collect()
    }
    assert set(got) == set(lineitem_q4)
    for flag, (x, y) in lineitem_q4.items():
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        g_slope, g_icept, g_r2 = got[flag]
        assert abs(g_slope - slope) < 1e-3 * max(1.0, abs(slope)), flag
        assert abs(g_icept - intercept) < 1e-3 * max(1.0, abs(intercept)), flag
        assert abs(g_r2 - r2) < 1e-4, flag
