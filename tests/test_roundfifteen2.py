"""Round-15 bank batch 2 gate (``operators/roundfifteen2.py``): queue
isolation, raw-frame oracle parity via the queue entries, plan bars,
and independent Python replicas with float anchors for the six banked
ops (Siegel repeated medians, modified z-score outliers, user-activity
Zipf alpha, Hilbert locality audit, triangle closure delay, PSI score
split drift).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from itertools import combinations

import pytest

from mysql_public_data_ingestor_spark.operators import roundfifteen2 as r152
from mysql_public_data_ingestor_spark.tables import Tables
from tools.check_correctness import compare, duck_connection

EXPECTED = [
    "stats_siegel_repeated_medians",
    "events_modified_zscore_outliers",
    "events_user_activity_zipf_alpha",
    "layout_hilbert_locality_audit",
    "graph_triangle_closure_delay",
    "ml_psi_score_split_drift",
]


def _queued(name):
    for n, fn, oracle, _doc in r152.QUEUE:
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
    queued = {name for name, *_ in r152.QUEUE}
    assert queued == set(EXPECTED)
    leaked = queued & set(registry._REGISTRY)
    assert not leaked, f"queued names leaked into the live registry: {leaked}"


def test_queue_entries_well_formed():
    seen = set()
    for name, fn, oracle, doc in r152.QUEUE:
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


def _daily(spark, sf_dir):
    pdf = Tables(spark, sf_dir).orders.select("o_orderdate").toPandas()
    daily = Counter(dt.date() for dt in pdf["o_orderdate"])
    days = sorted(daily)
    return [(k + 1, daily[d]) for k, d in enumerate(days)], days


def test_siegel_matches_python(spark, sf_dir):
    pts, _days = _daily(spark, sf_dir)

    def slope_micro(a, b):
        (ka, ya), (kb, yb) = a, b
        rise, run = ya - yb, abs(ka - kb)
        mag = _halfup_int(10**6 * abs(rise), run)
        sgn = (1 if rise >= 0 else -1) * (1 if ka > kb else -1)
        return sgn * mag if rise != 0 else 0

    meds = []
    for i, a in enumerate(pts):
        ss = sorted(slope_micro(a, b) for j, b in enumerate(pts) if j != i)
        meds.append(ss[(len(ss) - 1) // 2])  # low median: 2rn >= cnt+1
    meds.sort()
    want = meds[(len(meds) - 1) // 2]
    fn, _ = _queued("stats_siegel_repeated_medians")
    got = fn(spark, sf_dir).toPandas().iloc[0]
    assert int(got["n_days"]) == len(pts)
    assert int(got["siegel_slope_micro"]) == want
    # float anchor: a near-stationary series has near-zero slope
    assert abs(want) < 10**6


def test_modz_matches_python(spark, sf_dir):
    pts, days = _daily(spark, sf_dir)
    ys = [y for _k, y in pts]

    def lomed(vals):
        vals = sorted(vals)
        return vals[(len(vals) - 1) // 2]

    m = lomed(ys)
    eps = lomed([abs(y - m) for y in ys])
    fn, _ = _queued("events_modified_zscore_outliers")
    got = fn(spark, sf_dir).toPandas()
    if eps == 0:
        assert len(got) == 0
        return
    want = []
    for d, (k, y) in zip(days, pts):
        dev = y - m
        mag = _halfup_int(r152.MODZ_C_MILLI * abs(dev), eps)
        z = -mag if dev < 0 else mag
        if abs(z) > r152.MODZ_THRESH_MILLI:
            want.append((d, y, z))
    want.sort(key=lambda t: (-abs(t[2]), t[0]))
    rows = [
        (str(r.day), int(r.daily_count), int(r.modz_milli))
        for r in got.itertuples()
    ]
    assert rows == [(str(d), y, z) for d, y, z in want]


def test_uzipf_matches_python(spark, sf_dir):
    pdf = Tables(spark, sf_dir).events.select("user_id").toPandas()
    act = Counter(pdf["user_id"])
    xs = Counter(act.values())
    n = sum(xs.values())
    qx = {}
    qc = {}
    for x in xs:
        n_ge = sum(c for v, c in xs.items() if v >= x)
        qx[x] = math.floor(_ref_ln_dbl(float(x)) * 1e6 + 0.5)
        qc[x] = math.floor(_ref_ln_dbl(n_ge / n) * 1e6 + 0.5)
    w = sum(xs.values())
    sx = sum(c * qx[x] for x, c in xs.items())
    sy = sum(c * qc[x] for x, c in xs.items())
    sxx = sum(c * qx[x] * qx[x] for x, c in xs.items())
    sxy = sum(c * qx[x] * qc[x] for x, c in xs.items())
    fn, _ = _queued("events_user_activity_zipf_alpha")
    got = fn(spark, sf_dir).toPandas().iloc[0]
    assert int(got["n_users"]) == n
    if sx > 0:
        assert int(got["alpha_mle_micro"]) == 10**6 + _halfup_int(10**12 * n, sx)
        # float anchor vs the CSN formula
        alpha = 1 + n / sum(c * math.log(x) for x, c in xs.items())
        assert abs(int(got["alpha_mle_micro"]) / 1e6 - alpha) < 1e-3
    den = w * sxx - sx * sx
    if den > 0:
        slope = -(w * sxy - sx * sy) / den
        assert int(got["ccdf_slope_neg_micro"]) == math.floor(slope * 1e6 + 0.5)


def test_hilbert_locality_matches_python(spark, sf_dir):
    from mysql_public_data_ingestor_spark.operators.roundfifteen2 import (
        _py_hilbert_d,
    )

    def morton(x, y, bits=4):
        out = 0
        for i in range(bits):
            out += ((x >> i) & 1) << (2 * i + 1)
            out += ((y >> i) & 1) << (2 * i)
        return out

    pdf = (
        Tables(spark, sf_dir)
        .orders.select("o_custkey", "o_orderdate", "o_totalprice")
        .toPandas()
    )
    n = 1 << r152.HILBERT_ORDER
    by = defaultdict(list)
    for ck, d, p in zip(pdf["o_custkey"], pdf["o_orderdate"], pdf["o_totalprice"]):
        if p is None:
            continue
        db = ((d.year - 1992) * 12 + d.month - 1) % n
        pb = min(int(p // r152.PRICE_BUCKET_WIDTH), n - 1)
        by[int(ck)].append((_py_hilbert_d(db, pb), morton(db, pb)))
    spans = []
    for cells in by.values():
        if len(cells) < 2:
            continue
        hs = [h for h, _z in cells]
        zs = [z for _h, z in cells]
        spans.append((max(hs) - min(hs), max(zs) - min(zs)))
    nc = len(spans)
    sh = sum(s for s, _ in spans)
    sz = sum(s for _, s in spans)
    wins = sum(1 for h, z in spans if h < z)
    fn, _ = _queued("layout_hilbert_locality_audit")
    got = fn(spark, sf_dir).toPandas().iloc[0]
    assert int(got["n_customers"]) == nc
    assert int(got["mean_span_hilbert_milli"]) == _halfup_int(1000 * sh, nc)
    assert int(got["mean_span_zorder_milli"]) == _halfup_int(1000 * sz, nc)
    assert int(got["hilbert_wins_micro"]) == _halfup_int(10**6 * wins, nc)
    # structural anchor: the Hilbert index is a bijection on the grid
    assert len({_py_hilbert_d(x, y) for x in range(n) for y in range(n)}) == n * n


def test_closure_delay_matches_python(spark, sf_dir):
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey").toPandas()
    od = t.orders.select("o_orderkey", "o_orderdate").toPandas()
    month = {
        int(k): (d.year - 1992) * 12 + d.month - 1
        for k, d in zip(od["o_orderkey"], od["o_orderdate"])
    }
    by_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[int(o)].add(int(p))
    edate = {}
    adj = defaultdict(set)
    for o, parts in by_order.items():
        m = month[o]
        for u, v in combinations(sorted(parts), 2):
            if (u, v) not in edate or m < edate[(u, v)]:
                edate[(u, v)] = m
            adj[u].add(v)
            adj[v].add(u)
    hist = Counter()
    for u, v in edate:
        for w in adj[u] & adj[v]:
            if w > v:  # count each triangle once (u < v < w)
                ms = sorted(
                    [edate[(u, v)], edate[(min(u, w), max(u, w))], edate[(v, w)]]
                )
                hist[ms[2] - ms[1]] += 1
    fn, _ = _queued("graph_triangle_closure_delay")
    got = fn(spark, sf_dir).toPandas()
    rows = {int(r.delay_months): int(r.n_triangles) for r in got.itertuples()}
    assert rows == dict(hist)
    # structural anchor: total equals the triangle count
    assert sum(rows.values()) == sum(hist.values())


def test_psi_split_matches_python(spark, sf_dir):
    from mysql_public_data_ingestor_spark.operators.corpus import TRAIN_CUT, VAL_CUT
    from mysql_public_data_ingestor_spark.operators.ml import _scored_labeled

    pdf = (
        _scored_labeled(Tables(spark, sf_dir)).select("doc_id", "score_q").toPandas()
    )
    width = 10000 // r152.PSI_BINS
    ct = Counter()
    cv = Counter()
    for doc_id, s in zip(pdf["doc_id"], pdf["score_q"]):
        b = int(hashlib.sha256(str(int(doc_id)).encode()).hexdigest()[:15], 16) % 100
        binq = min(int(s) // width, r152.PSI_BINS - 1)
        if b < TRAIN_CUT:
            ct[binq] += 1
        elif b < VAL_CUT:
            cv[binq] += 1
    nt, nv = sum(ct.values()), sum(cv.values())
    psi = 0
    oneside = 0
    for b in set(ct) | set(cv):
        if ct.get(b, 0) > 0 and cv.get(b, 0) > 0:
            pt = ct[b] / nt
            pv = cv[b] / nv
            psi += math.floor((pt - pv) * _ref_ln_dbl(pt / pv) * 1e9 + 0.5)
        else:
            oneside += 1
    fn, _ = _queued("ml_psi_score_split_drift")
    got = fn(spark, sf_dir).toPandas().iloc[0]
    assert int(got["n_train"]) == nt
    assert int(got["n_val"]) == nv
    assert int(got["psi_nano"]) == psi
    assert int(got["n_oneside_bins"]) == oneside
    # float anchor: PSI of a random split is small and non-negative
    assert psi >= -40  # quantization slack only
