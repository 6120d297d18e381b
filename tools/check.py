#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sf_dir> <verify_out_dir>

Mirrors the driver: for each key in oracle_sql.json, run the SQL in
DuckDB over the same parquet tables, load the Spark result parquet,
sort columns by name, and compare row count, schema-ish, and values.
Not shipped code — driver-side python (duckdb/pyarrow/pandas) only.
"""
import sys, json, os, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) < 1e-9
        except (TypeError, ValueError):
            return False
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key in sorted(oracle):
        try:
            want = con.execute(oracle[key]).fetchdf()
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{key}")
        except Exception as e:
            print(f"FAIL {key}: spark result missing: {e}")
            n_fail += 1
            continue
        want, got = canon(want), canon(got)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {key}: columns differ spark={list(got.columns)} oracle={list(want.columns)}")
            n_fail += 1
            continue
        # dtype drift (int32 vs int64 etc.) breaks strict schema compares
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in want.columns
                  if str(got[c].dtype) != str(want[c].dtype)
                  and {str(got[c].dtype), str(want[c].dtype)} - {"object"}
                  and not (str(got[c].dtype).startswith("float") and
                           str(want[c].dtype).startswith("float"))]
        if dt_bad:
            print(f"WARN {key}: dtype drift {dt_bad}")
        if len(want) != len(got):
            print(f"FAIL {key}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        bad = None
        for c in want.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {key}: value mismatch col={c} row={i} spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"ok   {key} ({len(got)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total oracles")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
