#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sf_dir),
sorts columns by name, and compares values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # row order: sort by all columns for order-insensitive compare
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        pass
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(p) for p in files]) if files else pd.DataFrame()
        if name not in oracles:
            results[name] = f"rows-only: {len(got)} rows" + (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA MISMATCH: got {list(g.columns)} want {list(w.columns)}"
            continue
        if len(g) != len(w):
            results[name] = f"ROWCOUNT MISMATCH: got {len(g)} want {len(w)}"
            continue
        bad = []
        for c in g.columns:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(wv.dtype, np.floating):
                eq = np.allclose(gv.astype(float), wv.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = eq
                close = np.allclose(gv.astype(float), wv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
                if not exact:
                    md = np.nanmax(np.abs(gv.astype(float) - wv.astype(float)))
                    bad.append(f"{c}: max|diff|={md:.3e}{' (close)' if close else ''}")
            else:
                if not (pd.Series(gv).astype(str) == pd.Series(wv).astype(str)).all():
                    n = int((pd.Series(gv).astype(str) != pd.Series(wv).astype(str)).sum())
                    bad.append(f"{c}: {n} mismatched values")
        results[name] = "OK" if not bad else "VALUE MISMATCH: " + "; ".join(bad)

    width = max(len(k) for k in results) if results else 10
    nok = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" or v.startswith("rows-only") and "EMPTY" not in v else "FAIL"
        if flag == "PASS":
            nok += 1
        print(f"{flag}  {k:<{width}}  {v}")
    print(f"\n{nok}/{len(results)} pass")
    sys.exit(0 if nok == len(results) else 1)


if __name__ == "__main__":
    main()
