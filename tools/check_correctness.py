"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and (where an oracle exists) the
same query on DuckDB, then compares: row count, column names, and cell
values (columns sorted by name, rows sorted by all columns) — i.e. the
same signal the driver's order-insensitive value-hash sees.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_public_data_ingestor_spark.registry import all_queries
from mysql_public_data_ingestor_spark.session import get_spark
from mysql_public_data_ingestor_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes that stringify differently but hash the same
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            # nullable Int64, NOT float64: 60-bit hash values exceed 2^53
            # and would collide after a float cast, masking mismatches
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    # dtype parity (a dtype/repr-sensitive hash would flip on these);
    # the Spark-ns vs DuckDB-us timestamp unit is engine-imposed and
    # value-equal, so it's exempt
    for c in sdf.columns:
        st, ot = str(sdf[c].dtype), str(odf[c].dtype)
        if st != ot and not (st.startswith("datetime64") and ot.startswith("datetime64")):
            problems.append(f"col {c}: dtype differs: spark={st} oracle={ot}")
    if problems:
        return problems
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            eq = (sv.isna() & ov.isna()) | np.isclose(sv, ov, rtol=0, atol=0, equal_nan=True)
            exact = bool(eq.all())
            close = bool(
                ((sv.isna() & ov.isna()) | np.isclose(sv, ov, rtol=1e-9, equal_nan=True)).all()
            )
            if not exact:
                n_bad = int((~eq).sum())
                tag = "CLOSE-BUT-NOT-EXACT (hash would FAIL)" if close else "DIFFERENT"
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {n_bad} mismatched values [{tag}] e.g. row {idx}: "
                    f"spark={sv[idx]!r} oracle={ov[idx]!r}"
                )
        else:
            eq = (sv.isna() & ov.isna()) | (sv == ov)
            if not bool(eq.all()):
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatched values e.g. row {idx}: "
                    f"spark={sv[idx]!r} oracle={ov[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness")
    con = duck_connection(sf_dir)
    specs = all_queries()
    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
