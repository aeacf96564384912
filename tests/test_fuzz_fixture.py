"""The fuzz-fixture builder must preserve exactly what the gate relies
on (keys, row counts, date columns, n_chars-text consistency) while
actually planting the stress cases — a builder bug would turn the
check-fuzz gate into a no-op that "passes" without probing anything."""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

BASE = "/root/testdata/sf0.001"  # smallest fixture: builder is scale-free


@pytest.fixture(scope="module")
def fuzz_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzzfix")
    out = {"plain": str(root / "plain"), "uni": str(root / "uni")}
    for profile, d in out.items():
        cmd = [sys.executable, "tools/make_fuzz_fixture.py", BASE, d]
        if profile == "uni":
            cmd.append("--unicode")
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    con.execute(f"CREATE VIEW ev AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    con.execute(f"CREATE VIEW li AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')")
    return con


def test_rows_keys_and_dates_preserved(fuzz_dirs):
    base = _con(BASE)
    for d in fuzz_dirs.values():
        f = _con(d)
        for view, key in [("docs", "doc_id"), ("ev", "event_id"), ("li", "l_orderkey")]:
            assert f.execute(f"SELECT count(*) FROM {view}").fetchone() == base.execute(
                f"SELECT count(*) FROM {view}"
            ).fetchone()
            # key sets identical to the base for EVERY view, not just docs
            # (probe ids keep selecting real rows)
            fuzz_keys = {r[0] for r in f.execute(f"SELECT {key} FROM {view}").fetchall()}
            base_keys = {r[0] for r in base.execute(f"SELECT {key} FROM {view}").fetchall()}
            assert fuzz_keys == base_keys, f"{view}.{key} key set changed"
        # date/timestamp columns untouched (TPC-H predicates must hit)
        assert f.execute("SELECT min(l_shipdate), max(l_shipdate) FROM li").fetchone() == base.execute(
            "SELECT min(l_shipdate), max(l_shipdate) FROM li"
        ).fetchone()
        assert f.execute("SELECT min(ts), max(ts) FROM ev").fetchone() == base.execute(
            "SELECT min(ts), max(ts) FROM ev"
        ).fetchone()


def test_n_chars_stays_consistent_with_text(fuzz_dirs):
    for d in fuzz_dirs.values():
        bad = _con(d).execute("SELECT count(*) FROM docs WHERE n_chars <> length(text)").fetchone()[0]
        assert bad == 0


def test_plain_profile_plants_degenerate_docs_and_magnitudes(fuzz_dirs):
    f = _con(fuzz_dirs["plain"])
    assert f.execute("SELECT count(*) FROM docs WHERE n_chars = 0").fetchone()[0] >= 1
    assert f.execute("SELECT count(*) FROM docs WHERE n_chars = 1").fetchone()[0] >= 1
    # the web-crawl outlier: one document far beyond the corpus norm
    assert f.execute("SELECT max(n_chars) FROM docs").fetchone()[0] > 10000
    base = _con(BASE)
    # prices x100, some event values negative
    fmax = f.execute("SELECT max(l_extendedprice) FROM li").fetchone()[0]
    bmax = base.execute("SELECT max(l_extendedprice) FROM li").fetchone()[0]
    assert abs(fmax - 100.0 * bmax) < 1.0
    assert f.execute("SELECT count(*) FROM ev WHERE value < 0").fetchone()[0] > 0


def test_unicode_profile_plants_multibyte_text(fuzz_dirs):
    f = _con(fuzz_dirs["uni"])
    n_mb = f.execute(
        "SELECT count(*) FROM docs WHERE octet_length(encode(text)) > length(text)"
    ).fetchone()[0]
    assert n_mb >= 10  # ~6% of docs got a multibyte suffix


def test_skew_profile_concentrates_events_but_changes_nothing_else(tmp_path):
    out = str(tmp_path / "skew")
    subprocess.run(
        [sys.executable, "tools/make_fuzz_fixture.py", BASE, out, "--skew"],
        check=True, capture_output=True,
    )
    f, base = _con(out), _con(BASE)
    # ~30% of events on one key
    top = f.execute(
        "SELECT count(*) FROM ev GROUP BY user_id ORDER BY 1 DESC LIMIT 1"
    ).fetchone()[0]
    total = f.execute("SELECT count(*) FROM ev").fetchone()[0]
    assert top >= 0.25 * total
    # the hot key stays inside the original user domain (joins resolve)
    hot = f.execute(
        "SELECT user_id FROM ev GROUP BY user_id ORDER BY count(*) DESC LIMIT 1"
    ).fetchone()[0]
    assert hot in {r[0] for r in base.execute("SELECT DISTINCT user_id FROM ev").fetchall()}
    # everything except user_id untouched
    assert f.execute("SELECT sum(hash(event_id)), sum(hash(value)), sum(hash(ts)) FROM ev").fetchone() == \
        base.execute("SELECT sum(hash(event_id)), sum(hash(value)), sum(hash(ts)) FROM ev").fetchone()
    assert f.execute("SELECT count(*) FROM docs WHERE text IS NULL").fetchone()[0] == 0
