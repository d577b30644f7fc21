#!/usr/bin/env python3
"""Local dev harness mimicking the driver's t2 oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
paired oracle_sql.json query in DuckDB against the sf_dir parquet
tables, and compares row counts, column names (sorted), and values.
Dev-only; the real gate is the driver's CORRECTNESS_r{N}.json.
"""
import json, sys, glob, os
import duckdb

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check: {len(got)} rows)")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        ok = True
        g, e = got.reindex(sorted(got.columns), axis=1), exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}"); ok = False
        elif len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); ok = False
        else:
            import pandas as pd
            for c in g.columns:
                a, b = g[c], e[c]
                # the driver's hash is dtype-SENSITIVE (int64 907372800 vs
                # float64 907372800.0 hash differently) — surface any
                # numeric-kind mismatch as a failure, not just value diffs
                if a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} <= set("ifub"):
                    print(f"FAIL {name}: column {c} dtype kind differs: "
                          f"spark={a.dtype} duckdb={b.dtype} (driver hash mismatch)")
                    ok = False
                    break
                try:
                    pd.testing.assert_series_equal(a, b, check_dtype=False,
                                                   check_names=False, check_exact=True)
                except AssertionError as ex:
                    print(f"FAIL {name}: column {c} values differ (dtype {a.dtype} vs {b.dtype})")
                    diff = (a != b) & ~(a.isna() & b.isna())
                    idx = diff[diff].index[:3]
                    for i in idx:
                        print(f"   row {i}: spark={a[i]!r} duckdb={b[i]!r}")
                    ok = False
                    break
        if ok: print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else: n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)-n_pass-n_fail} skipped/no-oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
