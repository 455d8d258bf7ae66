#!/usr/bin/env python3
"""Local pre-check of SparkEntry queries against the DuckDB oracle.

Mimics the driver's t2 compare: for each query result parquet written by
graft.Verify, run the matching oracle SQL in DuckDB over the same sf
tables, sort columns by name, and compare row-by-row values.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir] [qid...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical form for value compare (mirrors a hash-of-values check)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


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
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols = sorted(spark_rel.columns)
        spark_rows = spark_rel.select(", ".join(f'"{c}"' for c in scols)).fetchall()
        try:
            o_rel = con.sql(oracles[qid])
        except Exception as e:
            print(f"ORACLE-ERROR {qid}: {e}")
            n_bad += 1
            continue
        ocols = sorted(o_rel.columns)
        if scols != ocols:
            print(f"SCHEMA-MISMATCH {qid}: spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        o_rows = o_rel.select(", ".join(f'"{c}"' for c in ocols)).fetchall()
        if len(spark_rows) != len(o_rows):
            print(f"ROWCOUNT-MISMATCH {qid}: spark={len(spark_rows)} oracle={len(o_rows)}")
            n_bad += 1
            continue
        bad = None
        for i, (sr, orr) in enumerate(zip(spark_rows, o_rows)):
            cs, co = [canon(v) for v in sr], [canon(v) for v in orr]
            if cs != co:
                bad = (i, cs, co)
                break
        if bad:
            i, cs, co = bad
            print(f"VALUE-MISMATCH {qid} row {i}:\n  cols : {scols}\n  spark: {cs}\n  duck : {co}")
            n_bad += 1
        else:
            print(f"OK {qid} ({len(spark_rows)} rows)")
            n_ok += 1

    print(f"\n{n_ok} ok, {n_bad} bad, {n_noresult} missing")
    sys.exit(1 if (n_bad or n_noresult) else 0)


if __name__ == "__main__":
    main()
