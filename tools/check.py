#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
  (run `graft.Verify <sfDir> <outDir>` first, e.g. via sbt)

For each query dumped by graft.Verify into <outDir>/<name>/ (parquet) with an
entry in <outDir>/oracle_sql.json, runs the oracle SQL in DuckDB against the
parquet tables in <sfDir> and compares: schema (column names sorted), row
count, and values (rows sorted by all columns, exact equality).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    # An oracle entry whose query crashed in Verify leaves NO output dir —
    # that must fail loudly, not silently drop out of the walk below.
    for name in sorted(oracles):
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"[FAIL] {name}: query produced no output (crashed in Verify?)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no parquet output"); n_fail += 1; continue
        if name not in oracles:
            n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            print(f"[rows-only] {name}: {n} rows"); continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(exp.columns)}"); ok = False
        elif len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}"); ok = False
        else:
            gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            try:
                import pandas as pd
                pd.testing.assert_frame_equal(gs, es, check_dtype=True, check_exact=True)
            except AssertionError as e:
                print(f"[FAIL] {name}: values differ\n{str(e)[:800]}")
                # show first diff rows
                neq = (gs != es) & ~(gs.isna() & es.isna())
                bad = neq.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    print("  spark:", gs.loc[i].to_dict())
                    print("  duck :", es.loc[i].to_dict())
                ok = False
        if ok:
            print(f"[PASS] {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n)) and n not in oracles])} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
