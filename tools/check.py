#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every parquet table in
<sfDir> as a DuckDB view, runs each oracle, and compares against the
Spark result parquet at <verifyOutDir>/<name>/ on:
  - column names (sorted)
  - row count
  - exact multiset of rows (column-name-sorted, values normalized)
"""
import decimal
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — we demand bit-identical doubles
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def rows_key(df):
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(norm(v) for v in row))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result dir")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # The driver's hasher normalizes Spark-parquet Decimal and DuckDB
        # decimal differently (round-1 e5_casts false-green). Raw DECIMAL
        # output is therefore banned from gate queries: cast the final value
        # to VARCHAR or DOUBLE on both sides.
        dec_cols = sorted(
            c for df in (got, exp) for c in df.columns
            if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any())
        if dec_cols:
            print(f"FAIL {name}: raw DECIMAL output column(s) {dec_cols} — "
                  "driver hasher diverges on decimals; cast to VARCHAR/DOUBLE")
            n_fail += 1
            continue
        # The driver's comparator sort_values-crashes on unhashable
        # array cells (round-9: 4 gates certified 'err' that way). Raw
        # array/list output is therefore banned the same way DECIMAL is:
        # stringify on both sides (array_join / array_to_string).
        arr_cols = sorted({
            c for df in (got, exp) for c in df.columns
            if df[c].map(lambda v: isinstance(v, (list, tuple))
                         or type(v).__name__ == "ndarray").any()})
        if arr_cols:
            print(f"FAIL {name}: raw array output column(s) {arr_cols} — "
                  "driver comparator crashes on array cells; use "
                  "array_join/array_to_string on both sides")
            n_fail += 1
            continue
        gk, ek = rows_key(got), rows_key(exp)
        if gk != ek:
            bad = [i for i, (a, b) in enumerate(zip(gk, ek)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted-row idx {bad}")
            for i in bad:
                print(f"   spark:  {gk[i]}")
                print(f"   oracle: {ek[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
