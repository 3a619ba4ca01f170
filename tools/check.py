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


# timestamp_ntz is deliberately NOT banned: the corpus's tz-naive
# timestamps hash identically on both engines (4 long-green gates emit it)
BANNED_LOGICAL = ("decimal", "array<", "map<")


def spark_parquet_banned(con, res_dir):
    """Hasher-divergent types in the SPARK result's physical parquet schema.

    duckdb->pandas converts DECIMAL(38,0) to float64, so any pandas-value
    isinstance check is dead code for exactly the case it guards (the
    round-12 u4/do_num false-green) — inspect the parquet metadata instead.
    """
    rows = con.sql(
        f"SELECT name, type, converted_type, logical_type "
        f"FROM parquet_schema('{res_dir}/*.parquet')").fetchall()
    bad = []
    for name, typ, conv, logi in rows:
        blob = " ".join(str(x) for x in (typ, conv, logi)).upper()
        if any(k in blob for k in ("DECIMAL", "LIST", "MAP")):
            bad.append(f"{name}: {conv or logi or typ}")
    return sorted(set(bad))


def oracle_banned(rel):
    """Hasher-divergent types in the ORACLE relation, read from duckdb's
    own type info BEFORE the .df() conversion erases them."""
    bad = []
    for c, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if ("DECIMAL" in ts or "HUGEINT" in ts or "[]" in ts
                or ts.startswith("MAP") or ts.startswith("STRUCT")):
            bad.append(f"{c}: {ts}")
    return sorted(set(bad))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    # Verify's per-gate logical-schema sentinel (schemas.json): catches
    # hasher-sensitive Spark output types even when a gate's oracle is
    # rows-only (no SQL) and so never reaches the per-gate loop below.
    # Gates that DO appear in oracle_sql.json are skipped here — the loop
    # below re-checks them physically (parquet metadata + duckdb types),
    # and counting both would overstate distinct failing gates.
    schemas_p = Path(out_dir) / "schemas.json"
    schema_fail = 0
    if schemas_p.exists():
        for gate, cols in sorted(json.loads(schemas_p.read_text()).items()):
            if gate in oracle:
                continue
            bad = [f"{c}: {t}" for c, t in cols.items()
                   if any(k in t.lower() for k in BANNED_LOGICAL)]
            if bad:
                print(f"FAIL {gate}: hasher-divergent output type(s) {bad} — "
                      "cast to DOUBLE/STRING (round-1 e5_casts, round-12 u4)")
                schema_fail += 1
    # Plan-shape fingerprint diff (informational, never failing): Verify
    # dumps per-gate physical-node counts to plans.json; compare against
    # the committed prior-round baseline so a silently changed shape (new
    # Exchange, broadcast join fallen to sort-merge) gets NAMED even when
    # wall time hides it. Bench's per-gate bytes catch the cost; this
    # names the cause.
    plans_p = Path(out_dir) / "plans.json"
    baseline_p = Path(__file__).parent / "plans_baseline.json"
    if plans_p.exists() and baseline_p.exists():
        cur = json.loads(plans_p.read_text())
        base = json.loads(baseline_p.read_text())
        changed = []
        for gate in sorted(set(cur) & set(base)):
            deltas = {k: (base[gate].get(k, 0), v)
                      for k, v in cur[gate].items()
                      if v != base[gate].get(k, 0)}
            if deltas:
                changed.append((gate, deltas))
        for gate, deltas in changed:
            print(f"PLAN {gate}: " + ", ".join(
                f"{k} {a}->{b}" for k, (a, b) in sorted(deltas.items())))
        print(f"== plans: {len(changed)} of {len(set(cur) & set(base))} "
              f"gates changed shape vs baseline; "
              f"{len(set(cur) - set(base))} new, "
              f"{len(set(base) - set(cur))} gone (informational) ==")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result dir")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            bad_o = oracle_banned(rel)
            exp = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        bad_s = spark_parquet_banned(con, res_dir)
        if bad_s or bad_o:
            print(f"FAIL {name}: hasher-divergent output type(s) — "
                  f"spark parquet {bad_s}, oracle {bad_o}; cast the final "
                  "value to DOUBLE/VARCHAR on BOTH sides")
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
        # (Raw DECIMAL detection moved UP to the parquet_schema/duckdb-type
        # checks: duckdb->pandas converts decimals to float64, so a pandas
        # isinstance(Decimal) test here is dead code for exactly the case
        # it guards — the round-12 u4/do_num false-green.)
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
    n_fail += schema_fail
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
