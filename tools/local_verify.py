#!/usr/bin/env python3
"""DEV-ONLY harness (not part of the shipped library): mirrors the
driver's correctness gate locally. Runs each oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables and compares
against the Spark parquet output written by graft.Verify.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists aren't hashable -> stringify for sorting/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple))
                     or 'ndarray' in type(v).__name__).any():
            df[c] = df[c].map(lambda v: json.dumps(
                [x.item() if hasattr(x, 'item') else x for x in v])
                if v is not None else None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            n_fail += 1; continue
        # exact compare; report first mismatching cell
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                mismatch = (c, a[i], b[i], a.dtype, b.dtype)
                break
        if mismatch:
            c, av, bv, at, bt = mismatch
            print(f"FAIL {name}: col {c} spark={av!r}({at}) duck={bv!r}({bt})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
