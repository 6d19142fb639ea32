#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (Spark) to an
outDir, then run each oracle_sql.json query in DuckDB over the same parquet
tables, and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify] [only_query ...]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FLAGS = [a for a in sys.argv[3:] if a.startswith("--")]
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    cmd = ["sbt", "--error", f'runMain graft.Verify {SF_DIR} {OUT_DIR}']
    print(f"[check] {' '.join(cmd)}")
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(" ", line[:200])
    if r.returncode != 0:
        print("[check] verify FAILED rc=", r.returncode)
        sys.exit(1)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        # unify ints
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> bool:
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns differ\n  spark: {list(a.columns)}\n  duck:  {list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"FAIL {name}: row count {len(a)} vs {len(b)}")
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) | (av == bv) | ((av - bv).abs() < 1e-12)).all()
        else:
            ok = (av.astype(str) == bv.astype(str)).all()
        if not ok:
            bad = (av.astype(str) != bv.astype(str))
            idx = bad[bad].index[:5]
            print(f"FAIL {name}: column {c} differs at rows {list(idx)}")
            for i in idx:
                print(f"   row {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")
            return False
    print(f"PASS {name} ({len(a)} rows)")
    return True


def main():
    if "--skip-verify" not in FLAGS:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(OUT_DIR, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY:
            continue
        pdir = Path(OUT_DIR) / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(pdir.glob("*.parquet"))], ignore_index=True
        ) if list(pdir.glob("*.parquet")) else pd.DataFrame()
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if compare(name, spark_df, duck_df):
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n[check] {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
