#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sf_dir),
sorts columns by name, and compares values.
"""
import json, sys, glob, os
import datetime
import decimal
import duckdb
import pandas as pd
import numpy as np


def render_cell(v):
    """Canonical rendering of one value, dtype-faithful.

    The driver gate hashes RENDERED values after a pandas round-trip, so a
    Spark DECIMAL (pandas object of Decimal) vs a DuckDB float64, or a Spark
    int64 vs a DuckDB HUGEINT-rendered float64, must FAIL here even when the
    numbers are equal — that is exactly the round-13 five-query miss.
    """
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if np.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, (np.datetime64, pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        # DATE columns round-trip as date objects from Spark parquet but as
        # midnight datetime64 from DuckDB fetchdf; the driver treats those
        # as equal, so canonicalize midnight to the date rendering
        if ts.tzinfo is None and ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(render_cell(x) for x in v) + "]"
    return str(v)

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
            gr = pd.Series(gv, dtype=object).map(render_cell)
            wr = pd.Series(wv, dtype=object).map(render_cell)
            ne = (gr != wr)
            if ne.any():
                n = int(ne.sum())
                note = ""
                # numeric diagnostic: equal-but-differently-typed vs truly off
                try:
                    gf = gv.astype(float)
                    wf = wv.astype(float)
                    if np.allclose(gf, wf, rtol=0, atol=0, equal_nan=True):
                        note = " (values equal, DTYPE/RENDER mismatch: " \
                            f"{gr[ne].iloc[0]!r} vs {wr[ne].iloc[0]!r})"
                    else:
                        md = np.nanmax(np.abs(gf - wf))
                        note = f" max|diff|={md:.3e}"
                except Exception:
                    note = f" e.g. {gr[ne].iloc[0]!r} vs {wr[ne].iloc[0]!r}"
                bad.append(f"{c}: {n} mismatched{note}")
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
