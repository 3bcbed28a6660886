#!/usr/bin/env python3
"""Local oracle parity checker, mimicking the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/ it runs the
matching SQL from oracle_sql.json in DuckDB (with each table of <sfDir>
registered as a view) and compares: column names (sorted), row counts,
and cell values after sorting rows by all columns. Reports exact
mismatches plus near-miss diagnostics for floats.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(norm_cell)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, x = norm_df(got), norm_df(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(x)}")
            n_fail += 1
            continue
        if len(g) == 0:
            print(f"WARN {name}: EMPTY result (matches, but weak)")
            n_pass += 1
            continue
        eq = g.eq(x) | (g.isna() & x.isna())
        if eq.all().all():
            # dtype check: int vs float column mismatches can still trip a hasher
            dt_mismatch = [c for c in g.columns
                           if got[sorted(got.columns).index(c) if False else c].dtype.kind
                           != exp[c].dtype.kind]
            note = f" [dtype diff: {dt_mismatch}]" if dt_mismatch else ""
            print(f"PASS {name}: {len(g)} rows{note}")
            n_pass += 1
        else:
            bad = (~eq).any(axis=1)
            idx = g.index[bad][:5]
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first diffs:")
            for i in idx:
                for c in g.columns:
                    gv, xv = g.at[i, c], x.at[i, c]
                    same = (gv == xv) or (gv is None and xv is None)
                    if not same:
                        print(f"    row {i} col {c}: spark={gv!r} oracle={xv!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
