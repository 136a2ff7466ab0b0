#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Runs each oracle_sql.json entry in DuckDB over the same parquet tables and
compares against the parquet the Verify main dumped. Mirrors the driver:
sort columns by name, sort rows, compare values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort", na_position="first").reset_index(drop=True)


def compare(name, exp, got):
    problems = []
    if sorted(exp.columns) != sorted(got.columns):
        return [f"columns differ: oracle={sorted(exp.columns)} spark={sorted(got.columns)}"]
    if len(exp) != len(got):
        problems.append(f"row count differs: oracle={len(exp)} spark={len(got)}")
        return problems
    e, g = normalize(exp), normalize(got)
    for c in e.columns:
        ev, gv = e[c], g[c]
        # Driver-strictness: the driver hashes raw bytes, so a float64
        # oracle column vs an int64 spark column (the DuckDB
        # SUM(BIGINT)->HUGEINT->float64 trap, round-6 q83/t34/t35/t38/
        # t42/x110) is RED even when every value compares equal. Fail
        # loudly here instead of silently coercing 123.0 == 123.
        e_float = np.issubdtype(ev.dtype, np.floating)
        g_float = np.issubdtype(gv.dtype, np.floating)
        if e_float != g_float:
            problems.append(
                f"col {c} dtype mismatch: oracle={ev.dtype} spark={gv.dtype}"
                " (driver hash WILL differ; CAST the oracle column)")
            continue
        if e_float or g_float:
            ok = ((ev.isna() & gv.isna()) | (ev == gv)).all()
            if not ok:
                bad = (~((ev.isna() & gv.isna()) | (ev == gv))).idxmax()
                problems.append(f"col {c} differs at row {bad}: oracle={ev[bad]!r} spark={gv[bad]!r}")
        else:
            es, gs = ev.astype(str), gv.astype(str)
            if not (es == gs).all():
                bad = (es != gs).idxmax()
                problems.append(f"col {c} differs at row {bad}: oracle={ev[bad]!r} spark={gv[bad]!r} (dtypes {ev.dtype}/{gv.dtype})")
    return problems


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle sql error: {ex}")
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        problems = compare(name, exp, got)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
    # queries without oracle: rows-only
    dumped = {os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)}
    for name in sorted(dumped - set(oracle)):
        files = glob.glob(f"{out}/{name}/*.parquet")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"{'ROWS' if n > 0 else 'FAIL'} {name}: rows={n} (no oracle)")
    print(f"\n{n_ok}/{len(oracle)} oracle-checked queries OK")


if __name__ == "__main__":
    main()
