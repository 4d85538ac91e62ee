#!/usr/bin/env python3
"""Dev-only local oracle check (mimics the driver's DuckDB compare).

Usage: python3 tools/local_check.py /root/testdata/sf0.01 /tmp/verify_out

Not part of the Scala build — the engine itself is pure Scala/Spark.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    for name in results:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING-OUTPUT {name}"); n_fail += 1; continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status:>18} {name} rows={len(got)}")
            continue
        try:
            exp = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"ORACLE-SQL-ERROR {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL-COLS {name}: got={list(got.columns)} exp={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL-ROWS {name}: got={len(got)} exp={len(exp)}")
            n_fail += 1; continue
        for c in got.columns:
            if str(got[c].dtype) != str(exp[c].dtype):
                print(f"  WARN-DTYPE {name}.{c}: got={got[c].dtype} exp={exp[c].dtype}")
        bad = None
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                if str(g.dtype) == "object" or str(e.dtype) == "object":
                    eq = (g.astype(str) == e.astype(str)) | (g.isna() & e.isna())
                else:
                    eq = (g == e) | (g.isna() & e.isna())
                if not eq.all():
                    i = (~eq).idxmax()
                    bad = (c, g[i], e[i]); break
            except Exception as ex:
                bad = (c, "cmp-error", ex); break
        if bad:
            print(f"FAIL-VALS {name}: col={bad[0]} got={bad[1]!r} exp={bad[2]!r}")
            n_fail += 1
        else:
            print(f"{'PASS':>18} {name} rows={len(got)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
