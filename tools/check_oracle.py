#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare values (columns sorted by name).

The driver's hash is dtype/representation-sensitive (it hashes the serialized
frame), so DuckDB returning HUGEINT→float64 for an integer sum while Spark
emits int64 is a FAIL there even when every value is equal. This checker
mirrors that: value equality alone is not enough — the serialized form
(repr of each cell, which distinguishes 5 from 5.0) must match too.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os, hashlib
import duckdb

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def frame_hash(df):
    """Hash the dtype-sensitive serialized form, like the driver's gate."""
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        for v in df[c]:
            h.update(repr(v).encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); continue
        diff_cols = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                diff_cols.append((c, int((~eq).sum())))
        if diff_cols:
            print(f"FAIL {name}: value diffs {diff_cols}")
            for c, _ in diff_cols[:2]:
                mask = ~((g[c] == w[c]) | (g[c].isna() & w[c].isna()))
                print("  spark:", g[mask][c].head(3).tolist(),
                      " oracle:", w[mask][c].head(3).tolist())
        elif frame_hash(g) != frame_hash(w):
            dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(w[c].dtype)]
            print(f"FAIL {name}: values equal but serialized form differs "
                  f"(dtype mismatches: {dt})")
        else:
            print(f"OK   {name} ({len(g)} rows)"); n_ok += 1
    print(f"== {n_ok}/{len(oracle)} OK")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
