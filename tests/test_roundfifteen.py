"""Round-15 bank batch 1 gate (``operators/roundfifteen.py``): queue
isolation (banked, NOT registered — activation is round 15's move),
raw-frame oracle parity via the queue entries, plan bars, and
independent Python replicas with float anchors for the six banked ops
(Hoeffding D, median order-stat CI, entropy l-diversity,
weekday/weekend JS, packing bounds, geometric word-length fit).

Run with ``SPARK_GRAFT_TEST_SF_DIR=<dir>`` to point at any fixture.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

from mysql_public_data_ingestor_spark.operators import roundfifteen as r15
from mysql_public_data_ingestor_spark.tables import Tables
from tools.check_correctness import compare, duck_connection

EXPECTED = [
    "stats_hoeffding_d_qd",
    "stats_median_ci_orderstat",
    "privacy_entropy_l_diversity",
    "events_hourly_js_weekday_weekend",
    "corpus_packing_efficiency_bounds",
    "text_word_length_geometric_fit",
]


def _queued(name):
    for n, fn, oracle, _doc in r15.QUEUE:
        if n == name:
            return fn, oracle
    raise KeyError(name)


def _halfup_int(num: int, den: int) -> int:
    mag = (2 * abs(num) + den) // (2 * den)
    return -mag if num < 0 else mag


def _ref_ln_dbl(x):
    from mysql_public_data_ingestor_spark.functions.detmath import ref_det_ln_fix

    L = ref_det_ln_fix(x)
    return None if L is None else L * (math.log(2) / 2**30)


def test_queue_is_banked_not_registered():
    from mysql_public_data_ingestor_spark import registry

    registry._ensure_loaded()
    queued = {name for name, *_ in r15.QUEUE}
    assert queued == set(EXPECTED)
    leaked = queued & set(registry._REGISTRY)
    assert not leaked, f"queued names leaked into the live registry: {leaked}"


def test_queue_entries_well_formed():
    seen = set()
    for name, fn, oracle, doc in r15.QUEUE:
        assert name not in seen
        seen.add(name)
        assert callable(fn)
        assert isinstance(oracle, str) and "SELECT" in oracle.upper()
        assert doc.strip()


@pytest.mark.parametrize("name", EXPECTED)
def test_queued_matches_oracle(spark, sf_dir, name):
    fn, oracle = _queued(name)
    sdf = fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        odf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", EXPECTED)
def test_plan_bars(spark, sf_dir, name):
    from mysql_public_data_ingestor_spark.plans import assert_no_cartesian

    fn, _oracle = _queued(name)
    assert_no_cartesian(fn(spark, sf_dir))


# ---------------------------------------------------------------------------
# replicas
# ---------------------------------------------------------------------------


def test_hoeffding_matches_python(spark, sf_dir):
    pdf = Tables(spark, sf_dir).lineitem.select("l_quantity", "l_discount").toPandas()
    pts = [
        (math.floor(q + 0.5), math.floor(d * 100.0 + 0.5))
        for q, d in zip(pdf["l_quantity"], pdf["l_discount"])
    ]
    grid = Counter(pts)
    n = len(pts)
    cells = list(grid.items())
    d1_16 = d2_256 = d3_64 = 0
    for (x, y), c in cells:
        ltx = sum(hc for (hx, _hy), hc in cells if hx < x)
        eqx_o = sum(hc for (hx, hy), hc in cells if hx == x and hy != y)
        lty = sum(hc for (_hx, hy), hc in cells if hy < y)
        eqy_o = sum(hc for (hx, hy), hc in cells if hy == y and hx != x)
        ltxy = sum(hc for (hx, hy), hc in cells if hx < x and hy < y)
        eqx_lty = sum(hc for (hx, hy), hc in cells if hx == x and hy < y)
        ltx_eqy = sum(hc for (hx, hy), hc in cells if hx < x and hy == y)
        r4 = 4 * ltx + 2 * (c + eqx_o - 1) + 4
        s4 = 4 * lty + 2 * (c + eqy_o - 1) + 4
        q4 = 4 * ltxy + 2 * (eqx_lty + ltx_eqy) + (c - 1) + 4
        d1_16 += c * (q4 - 4) * (q4 - 8)
        d2_256 += c * (r4 - 4) * (r4 - 8) * (s4 - 4) * (s4 - 8)
        d3_64 += c * (r4 - 8) * (s4 - 8) * (q4 - 4)
    d = (
        30.0
        * (
            float(n - 2) * float(n - 3) * (d1_16 / 16.0)
            + d2_256 / 256.0
            - 2.0 * float(n - 2) * (d3_64 / 64.0)
        )
        / (
            float(n)
            * float(n - 1)
            * float(n - 2)
            * float(n - 3)
            * float(n - 4)
        )
    )
    fn, _ = _queued("stats_hoeffding_d_qd")
    got = fn(spark, sf_dir).toPandas().iloc[0]
    assert int(got["n"]) == n
    assert int(got["hoeffding_d_nano"]) == math.floor(d * 1e9 + 0.5)
    # float anchor: D bounded
    assert -0.5 - 1e-9 <= d <= 1.0 + 1e-9


def test_median_ci_matches_python(spark, sf_dir):
    pdf = Tables(spark, sf_dir).orders.select("o_orderdate").toPandas()
    daily = Counter(dt.date() for dt in pdf["o_orderdate"])
    ys = sorted(daily.values())
    n = len(ys)
    lo_r = max(1, math.floor(n * 0.5 - r15.MEDCI_Z * math.sqrt(n) * 0.5))
    hi_r = min(n, math.ceil(1.0 + n * 0.5 + r15.MEDCI_Z * math.sqrt(n) * 0.5))
    med = ys[(n - 1) // 2] if n % 2 else ys[n // 2 - 1]
    fn, _ = _queued("stats_median_ci_orderstat")
    got = fn(spark, sf_dir).toPandas().iloc[0]
    assert int(got["n_days"]) == n
    assert int(got["median"]) == med
    assert int(got["ci_lo"]) == ys[lo_r - 1]
    assert int(got["ci_hi"]) == ys[hi_r - 1]
    assert (int(got["lo_rank"]), int(got["hi_rank"])) == (lo_r, hi_r)
    # structural anchor: CI brackets the median
    assert ys[lo_r - 1] <= med <= ys[hi_r - 1]


def test_entropy_ldiv_matches_python(spark, sf_dir):
    pdf = (
        Tables(spark, sf_dir).documents.select("lang", "n_chars", "source").toPandas()
    )
    grp = defaultdict(Counter)
    for lang, nc, src in zip(pdf["lang"], pdf["n_chars"], pdf["source"]):
        grp[(lang, int(nc) // r15.ELDIV_BUCKET)][src] += 1
    ents = {}
    for g, c in grp.items():
        ng = sum(c.values())
        h = -sum(
            math.floor((k / ng) * _ref_ln_dbl(k / ng) * 1e9 + 0.5)
            for k in c.values()
        )
        ents[g] = (ng, h)
    fn, _ = _queued("privacy_entropy_l_diversity")
    got = fn(spark, sf_dir).toPandas().iloc[0]
    assert int(got["n_groups"]) == len(ents)
    assert int(got["min_entropy_nano"]) == min(h for _ng, h in ents.values())
    num = sum(ng * h for ng, h in ents.values())
    den = sum(ng for ng, _h in ents.values())
    assert int(got["mean_entropy_nano"]) == _halfup_int(num, den)
    assert int(got["n_groups_below_ln2"]) == sum(
        1 for _ng, h in ents.values() if h < 693147181
    )
    # float anchor: entropies below ln(#sources)
    n_src = len({s for c in grp.values() for s in c})
    assert int(got["min_entropy_nano"]) <= math.log(n_src) * 1e9 + 10


def test_js_weekday_weekend_matches_python(spark, sf_dir):
    pdf = Tables(spark, sf_dir).events.select("ts").toPandas()
    cw = Counter()
    ce = Counter()
    for ts in pdf["ts"]:
        hr = ts.hour
        if ts.weekday() >= 5:  # Sat/Sun
            ce[hr] += 1
        else:
            cw[hr] += 1
    nw, ne = sum(cw.values()), sum(ce.values())
    js = 0
    for hr in set(cw) | set(ce):
        p = cw.get(hr, 0) / nw
        q = ce.get(hr, 0) / ne
        m = (p + q) * 0.5
        if p > 0:
            js += math.floor(0.5 * p * _ref_ln_dbl(p / m) * 1e9 + 0.5)
        if q > 0:
            js += math.floor(0.5 * q * _ref_ln_dbl(q / m) * 1e9 + 0.5)
    fn, _ = _queued("events_hourly_js_weekday_weekend")
    got = fn(spark, sf_dir).toPandas().iloc[0]
    assert int(got["n_weekday"]) == nw
    assert int(got["n_weekend"]) == ne
    assert int(got["js_divergence_nano"]) == js
    # float anchor: JS in [0, ln 2]
    assert -24 <= js <= math.log(2) * 1e9 + 24


def test_packing_bounds_matches_python(spark, sf_dir):
    pdf = Tables(spark, sf_dir).documents.select("text").toPandas()
    ws = re.compile(r"\s+")
    lens = [len(ws.sub(" ", t.lower()).strip().split(" ")) for t in pdf["text"]]
    fn, _ = _queued("corpus_packing_efficiency_bounds")
    got = fn(spark, sf_dir).toPandas()
    assert list(got["capacity"]) == list(r15.PACK_CAPS)
    total = sum(lens)
    for _, row in got.iterrows():
        cap = int(row["capacity"])
        nc = sum((l + cap - 1) // cap for l in lens)
        assert int(row["total_tokens"]) == total
        assert int(row["bins_lower_bound"]) == (total + cap - 1) // cap
        assert int(row["bins_no_concat"]) == nc
        assert int(row["waste_no_concat_micro"]) == 10**6 - _halfup_int(
            10**6 * total, cap * nc
        )
        # structural anchor: lower bound <= no-concat bins
        assert (total + cap - 1) // cap <= nc


def test_word_length_fit_matches_python(spark, sf_dir):
    pdf = Tables(spark, sf_dir).documents.select("lang", "text").toPandas()
    ws = re.compile(r"\s+")
    by = defaultdict(list)
    for lang, text in zip(pdf["lang"], pdf["text"]):
        for tok in ws.sub(" ", text.lower()).strip().split(" "):
            if tok:
                by[lang].append(len(tok))
    fn, _ = _queued("text_word_length_geometric_fit")
    got = fn(spark, sf_dir).toPandas()
    assert list(got["lang"]) == sorted(by)
    for _, row in got.iterrows():
        lens = by[row["lang"]]
        n, s = len(lens), sum(lens)
        n1 = sum(1 for l in lens if l == 1)
        assert int(row["n_tokens"]) == n
        assert int(row["mean_len_milli"]) == _halfup_int(1000 * s, n)
        assert int(row["geom_p_micro"]) == _halfup_int(10**6 * n, s)
        assert int(row["p1_observed_micro"]) == _halfup_int(10**6 * n1, n)
        assert int(row["p1_excess_micro"]) == _halfup_int(10**6 * n1, n) - _halfup_int(
            10**6 * n, s
        )
        assert int(row["max_len"]) == max(lens)
        # float anchor: geometric MLE p = 1/mean
        assert abs(int(row["geom_p_micro"]) / 1e6 - n / s) < 1e-5
