#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf parquet tables, load the Spark result parquet, and
compare (columns sorted by name, rows sorted, values normalized).

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Env filters (comma-separated query names, mirroring SPARK_GRAFT_ONLY on
the Scala mains):
  GRAFT_COMPARE_ONLY  — compare only these queries
  GRAFT_COMPARE_SKIP  — skip these (reported as SKIP, not counted as fail).
    Exists for oracles whose DuckDB replay is super-linear at large SF
    (dd6's transitive-closure walk is quadratic in component size) — the
    ENGINE side stays scale-sane; only the declarative checker isn't.
"""
import sys, json, glob, math, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind in "iu":
            s = s.astype("int64")
        elif s.dtype.kind == "f":
            s = s.astype("float64").round(9)
        elif s.dtype == object:
            def conv(v):
                if v is None:
                    return None
                if isinstance(v, float):
                    return round(v, 9)
                if isinstance(v, int):
                    return int(v)
                return str(v)
            s = s.map(conv)
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = {s for s in os.environ.get("GRAFT_COMPARE_ONLY", "").split(",") if s}
    skip = {s for s in os.environ.get("GRAFT_COMPARE_SKIP", "").split(",") if s}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if name in skip:
            print(f"SKIP  {name} (GRAFT_COMPARE_SKIP)"); continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ERR   {name}: {str(e).splitlines()[0][:160]}"); n_fail += 1; continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: cols spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        if a.equals(b):
            print(f"OK    {name} ({len(a)} rows)"); n_pass += 1
        else:
            neq = (a.fillna("<NA>") != b.fillna("<NA>"))
            bad_cols = [c for c in a.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            print(f"FAIL  {name}: {int(neq.any(axis=1).sum())}/{len(a)} rows differ, "
                  f"cols={bad_cols}; first diff row {i}:")
            print("   spark:", a.loc[i].to_dict())
            print("   duck :", b.loc[i].to_dict())
            n_fail += 1
    # rows-only queries (no oracle)
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = p.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{'OK   ' if rows > 0 else 'EMPTY'} {name} (rows-only, {rows} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
