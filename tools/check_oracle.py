#!/usr/bin/env python3
"""Local pre-check of SparkEntry queries against the DuckDB oracle.

Replicates the DRIVER's compare, which is pandas-dtype-sensitive: the
spark result parquet is loaded with pandas/pyarrow, the oracle SQL runs
in DuckDB and is fetched into pandas, columns are sorted by name, rows
sorted by all columns, and the two frames are compared with
pandas.util.hash_pandas_object.  A value-equal but dtype-different pair
(e.g. DuckDB HUGEINT -> float64 vs Spark int64) therefore FAILS here,
exactly as it does at the driver gate (see VERDICT.md round 1: the old
stringified-value compare reported OK on 19 driver-red qids).

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir] [qid...]
"""
import json
import sys
import traceback
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all columns — the driver's shape.

    Integer WIDTH is normalized to int64 (the driver's value hash is
    width-insensitive: int32 qids passed in r01), but int-vs-float and
    int-vs-object are NOT normalized — those are exactly the divergences
    the driver fails on (HUGEINT->float64 class).
    """
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])

    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_bad = n_noresult = 0
    for qid in sorted(oracles):
        if only and qid not in only:
            continue
        qdir = out_dir / qid
        if not qdir.exists():
            print(f"MISSING-RESULT {qid}")
            n_noresult += 1
            continue
        try:
            # Load the spark result through DuckDB like the oracle side so
            # timestamp columns arrive in the same unit (us) on both sides;
            # pandas.read_parquet would give ns and false-fail the compare.
            sdf = canonical(
                con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
        except Exception:
            print(f"HARNESS-ERROR {qid} (spark side):")
            traceback.print_exc(limit=2)
            n_bad += 1
            continue
        try:
            odf = canonical(con.sql(oracles[qid]).df())
        except Exception:
            print(f"ORACLE-ERROR {qid}:")
            traceback.print_exc(limit=2)
            n_bad += 1
            continue
        if list(sdf.columns) != list(odf.columns):
            print(f"SCHEMA-MISMATCH {qid}: spark={list(sdf.columns)} "
                  f"oracle={list(odf.columns)}")
            n_bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"ROWCOUNT-MISMATCH {qid}: spark={len(sdf)} oracle={len(odf)}")
            n_bad += 1
            continue
        # dtype check FIRST — this is what the old checker missed.
        dt_bad = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                  for c in sdf.columns if sdf[c].dtype != odf[c].dtype]
        if dt_bad:
            print(f"DTYPE-MISMATCH {qid}: " +
                  "; ".join(f"{c}: spark={a} oracle={b}" for c, a, b in dt_bad))
            n_bad += 1
            continue
        try:
            sh = pd.util.hash_pandas_object(sdf, index=False)
            oh = pd.util.hash_pandas_object(odf, index=False)
        except TypeError:
            print(f"HARNESS-ERROR {qid}: unhashable column (array/map output?)")
            traceback.print_exc(limit=1)
            n_bad += 1
            continue
        if not sh.equals(oh):
            diff = sdf.compare(odf) if sdf.shape == odf.shape else None
            print(f"HASH-MISMATCH {qid}:")
            if diff is not None and len(diff):
                print(diff.head(5).to_string())
            n_bad += 1
        else:
            print(f"OK {qid} ({len(sdf)} rows)")
            n_ok += 1

    print(f"\n{n_ok} ok, {n_bad} bad, {n_noresult} missing")
    sys.exit(1 if (n_bad or n_noresult) else 0)


if __name__ == "__main__":
    main()
