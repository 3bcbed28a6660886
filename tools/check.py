#!/usr/bin/env python3
"""Local oracle parity checker, mimicking the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--only q1,q2,...]
           [--json CORRECTNESS_local.json] [--slow-ms 5000]

For each query result parquet under <verifyOutDir>/<name>/ it runs the
matching SQL from oracle_sql.json in DuckDB (with each table of <sfDir>
registered as a view) and compares: column names (sorted), row counts,
and cell values after sorting rows by all columns. Reports exact
mismatches plus near-miss diagnostics for floats.

Per-query wall time (oracle + compare) is printed so oracle-cost
regressions (the round-13 class: a CTE chain DuckDB re-inlines per
reference) are visible in-round; queries slower than --slow-ms are
flagged SLOW. --json serializes the result in the driver's
CORRECTNESS_r{N}.json shape (plus wall_s / totals) so a builder-side
hard correctness signal can be committed every round even if the
driver-side artifact is zeroed.
"""
import json
import math
import sys
import time

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


def parse_args(argv):
    pos, only, json_path, slow_ms = [], None, None, 5000
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--only":
            only = set(argv[i + 1].split(","))
            i += 2
        elif a == "--json":
            json_path = argv[i + 1]
            i += 2
        elif a == "--slow-ms":
            slow_ms = int(argv[i + 1])
            i += 2
        else:
            pos.append(a)
            i += 1
    return pos[0], pos[1], only, json_path, slow_ms


def main():
    sf_dir, out_dir, only, json_path, slow_ms = parse_args(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    t_suite = time.time()

    def record(name, wall, *, rows_match=False, schema_match=False,
               hash_match=False, spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err,
                        "wall_s": round(wall, 2)}

    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        t0 = time.time()
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            record(name, time.time() - t0, err=f"spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, time.time() - t0, err=f"oracle SQL error: {e}")
            n_fail += 1
            continue
        g, x = norm_df(got), norm_df(exp)
        wall = time.time() - t0
        slow = f" SLOW {wall:.1f}s" if wall * 1000 >= slow_ms else f" ({wall:.1f}s)"
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(x.columns)}{slow}")
            record(name, wall, spark_rows=len(g), oracle_rows=len(x),
                   err=f"columns spark={list(g.columns)} oracle={list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(x)}{slow}")
            record(name, wall, schema_match=True, spark_rows=len(g),
                   oracle_rows=len(x), err="row count mismatch")
            n_fail += 1
            continue
        if len(g) == 0:
            print(f"WARN {name}: EMPTY result (matches, but weak){slow}")
            record(name, wall, rows_match=True, schema_match=True,
                   hash_match=True, spark_rows=0, oracle_rows=0)
            n_pass += 1
            continue
        eq = g.eq(x) | (g.isna() & x.isna())
        if eq.all().all():
            # dtype check: int vs float column mismatches can still trip a hasher
            dt_mismatch = [c for c in g.columns
                           if got[sorted(got.columns).index(c) if False else c].dtype.kind
                           != exp[c].dtype.kind]
            note = f" [dtype diff: {dt_mismatch}]" if dt_mismatch else ""
            print(f"PASS {name}: {len(g)} rows{note}{slow}")
            record(name, wall, rows_match=True, schema_match=True,
                   hash_match=True, spark_rows=len(g), oracle_rows=len(x),
                   err=f"dtype diff: {dt_mismatch}" if dt_mismatch else None)
            n_pass += 1
        else:
            bad = (~eq).any(axis=1)
            idx = g.index[bad][:5]
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first diffs:{slow}")
            for i in idx:
                for c in g.columns:
                    gv, xv = g.at[i, c], x.at[i, c]
                    same = (gv == xv) or (gv is None and xv is None)
                    if not same:
                        print(f"    row {i} col {c}: spark={gv!r} oracle={xv!r}")
            record(name, wall, schema_match=True, spark_rows=len(g),
                   oracle_rows=len(x), err=f"{int(bad.sum())}/{len(g)} rows differ")
            n_fail += 1
    total = time.time() - t_suite
    slowest = sorted(report.items(), key=lambda kv: -kv[1]["wall_s"])[:5]
    print(f"\n{n_pass} pass, {n_fail} fail ({total:.1f}s total; slowest: "
          + ", ".join(f"{k} {v['wall_s']}s" for k, v in slowest) + ")")
    if json_path:
        doc = dict(sorted(report.items()))
        doc["_summary"] = {"pass": n_pass, "fail": n_fail,
                           "total_wall_s": round(total, 1), "sf_dir": sf_dir}
        with open(json_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {json_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
