#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sf tables and compare (rows, schema-width, multiset of values
with column names sorted). Usage: check_correctness.py <sfDir> <outDir>
"""
import json, sys, glob, os, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize to object/str for hashing-ish compare, keep NaN/None merged
    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, float):
            v = round(v, 9)
            # keep IEEE -0.0 DISTINCT from +0.0: the driver's hash compare
            # sees the sign bit (the q186 class), so this checker must too
            # (python's == treats them equal, hence the sentinel)
            if v == 0.0 and math.copysign(1.0, v) < 0:
                return "-0.0"
            return v
        return v
    out = df.apply(lambda c: c.map(norm))
    return out.sort_values(by=list(out.columns), kind="mergesort",
                           na_position="first").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Iterate the EXPECTED query list (manifest ∪ oracle keys ∪ result dirs):
    # a query that crashed in Verify has no result dir and must count as a
    # FAIL, not silently shrink the denominator.
    expected = set(os.path.basename(d) for d in glob.glob(f"{out_dir}/q*")
                   if os.path.isdir(d))
    expected |= set(oracle.keys())
    names_file = f"{out_dir}/query_names.json"
    if os.path.exists(names_file):
        expected |= set(json.load(open(names_file)))
    results = {}
    for name in sorted(expected):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            results[name] = "MISSING result dir (query crashed in Verify?)"
            continue
        try:
            got = pq.read_table(glob.glob(f"{qdir}/*.parquet")[0]).to_pandas()
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)"
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"COL-MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
        else:
            neq = (g.fillna("__null__") != e.fillna("__null__")).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                results[name] = (f"VALUE-MISMATCH at row {i}:\n"
                                 f"  got={g.iloc[i].to_dict()}\n"
                                 f"  exp={e.iloc[i].to_dict()}")
            else:
                results[name] = f"OK ({len(g)} rows)"
    npass = sum(1 for v in results.values()
                if v.startswith("OK") or v.startswith("rows-only"))
    for k, v in sorted(results.items()):
        print(("PASS " if v.startswith("OK") or v.startswith("rows-only")
               else "FAIL ") + k + ": " + v)
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
