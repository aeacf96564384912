"""Property-based tests (hypothesis): invariants of the portable-hash /
exact-aggregation / schema / topology layers that the oracle queries
rely on.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_public_data_ingestor_spark.config import DatabasesConfig, ExtraDatabase
from mysql_public_data_ingestor_spark.schema import (
    mysql_type_for,
    render_create_table,
    schema_from_mysql_map,
)
from mysql_public_data_ingestor_spark.topology import expand_topology

# --- exact_sum quantization: Python model == DuckDB arithmetic ------------


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False))
def test_quantize_matches_duckdb(x):
    """floor(x*1e4 + 0.5) must agree between Python and DuckDB float
    math on identical doubles — the foundation of the exact-sum trick."""
    py = math.floor(x * 10000.0 + 0.5)
    dk = duckdb.connect().execute(
        "SELECT CAST(floor(? * 10000.0 + 0.5) AS BIGINT)", [x]
    ).fetchone()[0]
    assert py == dk


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0, max_value=1e5, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
def test_quantized_sum_order_independent(xs):
    """Integer sums are permutation-invariant (the property FP sums
    lack, and the reason exact_sum quantizes per row)."""
    q = [math.floor(x * 10000.0 + 0.5) for x in xs]
    assert sum(q) == sum(reversed(q))
    fwd = sum(q) / 10000.0
    rev = sum(reversed(q)) / 10000.0
    assert fwd == rev  # bit-identical, not just close


@settings(max_examples=200, deadline=None)
@given(st.decimals(min_value="-9999.99", max_value="9999.99", places=4))
def test_quantize_recovers_4dp_decimals(d):
    """Values with <=4 true decimal places round-trip exactly through
    the scale-4 quantizer (no value distortion for money columns)."""
    x = float(d)
    got = Decimal(math.floor(x * 10000.0 + 0.5)) / Decimal(10000)
    assert got == d.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)


# --- schema / topology ----------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghij_", min_size=1, max_size=8),
            st.sampled_from(["INT", "BIGINT", "FLOAT", "DOUBLE", "VARCHAR(10)", "BOOLEAN", "JSON"]),
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    )
)
def test_schema_order_preserved_and_ddl_renders(cols):
    schema = schema_from_mysql_map(cols)
    assert [f.name for f in schema.fields] == [c[0] for c in cols]
    ddl = render_create_table("d", "t", schema)
    for name, _ in cols:
        assert f"`{name}`" in ddl
    # every field has a MySQL rendering (round-trip doesn't throw)
    for f in schema.fields:
        assert mysql_type_for(f.dataType)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=20),
    st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=5),
        st.integers(min_value=1, max_value=10),
        max_size=5,
    ),
)
def test_topology_count_and_uniqueness(copies, extra):
    cfg = DatabasesConfig(
        prefix="p_",
        table_prefix="t",
        copies=copies,
        extra={k: ExtraDatabase(tables=v) for k, v in extra.items()},
    )
    targets = expand_topology(cfg)
    assert len(targets) == copies + sum(extra.values())
    assert len({(t.database, t.table) for t in targets}) == len(targets)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=-10**12, max_value=10**12), min_size=1, max_size=60)
)
def test_cusum_closed_form_equals_recursion(xs):
    """The prefix-sum closed forms used by events_cusum_changepoint —
    S+_t = P_t - min(0, min_{j<=t} P_j) and S-_t = max(0, max_{j<=t}
    P_j) - P_t — must equal the textbook sequential recursions
    S+_t = max(0, S+_{t-1} + y_t) / S-_t = max(0, S-_{t-1} - y_t)
    for EVERY t over arbitrary integer series (the operator feeds them
    the exactly-centered series n*x - sum(x), but the identity itself
    holds for any y)."""
    sp = sn = 0
    p = pmin = pmax = 0
    for y in xs:
        sp = max(0, sp + y)
        sn = max(0, sn - y)
        p += y
        pmin = min(pmin, p)
        pmax = max(pmax, p)
        assert sp == p - min(0, pmin)
        assert sn == max(0, pmax) - p


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=1, max_value=10**7),
    st.sampled_from([0, 2, 4, 6]),
)
def test_round_int_ratio_sql_twin_is_exact_half_up(num, den, dp):
    """sql_round_int_ratio must equal true decimal ROUND_HALF_UP (away
    from zero) of the exact rational num/den at dp decimals — including
    exactly-on-boundary ratios, where double-based round() flakes."""
    from mysql_public_data_ingestor_spark.functions.exact import sql_round_int_ratio

    got = duckdb.sql("SELECT " + sql_round_int_ratio(str(num), str(den), dp)).fetchone()[0]
    expected = float(
        (Decimal(num) / Decimal(den)).quantize(
            Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP
        )
    )
    assert got == expected, (num, den, dp, got, expected)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), st.booleans()),
        min_size=2,
        max_size=60,
    )
)
def test_auc_rank_sum_identity_with_ties(pairs):
    """The integer closed form used by ml_auc_by_lang —
    AUC = (Σ c_pos·(2·cum_before + cnt + 1) − n_pos(n_pos+1)) / (2·n_pos·n_neg)
    over the distinct-score domain with midrank ties — equals the
    pairwise definition P(score_pos > score_neg) + ½P(tie) for ANY
    score/label multiset."""
    n_pos = sum(1 for _, l in pairs if l)
    n_neg = len(pairs) - n_pos
    if n_pos == 0 or n_neg == 0:
        return
    # closed form over distinct values
    from collections import Counter

    cnt_all = Counter(s for s, _ in pairs)
    cnt_pos = Counter(s for s, l in pairs if l)
    cum = 0
    r2 = 0
    for v in sorted(cnt_all):
        r2 += cnt_pos.get(v, 0) * (2 * cum + cnt_all[v] + 1)
        cum += cnt_all[v]
    from fractions import Fraction

    auc_closed = Fraction(r2 - n_pos * (n_pos + 1), 2 * n_pos * n_neg)
    # pairwise definition
    wins = ties = 0
    for sp, lp in pairs:
        if not lp:
            continue
        for sn_, ln in pairs:
            if ln:
                continue
            if sp > sn_:
                wins += 1
            elif sp == sn_:
                ties += 1
    auc_pair = Fraction(2 * wins + ties, 2 * n_pos * n_neg)
    assert auc_closed == auc_pair
