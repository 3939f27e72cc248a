#!/usr/bin/env python3
"""Local oracle compare (builder-side replica of the driver's check):
reads graft.Verify output (<outDir>/<name>/ parquet + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, and compares
rows/schema/values with columns sorted by name and rows sorted.

usage: python3 dev/check_oracle.py <sfDir> <outDir> [name ...]
"""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if not names:
    names = sorted(oracle.keys())

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    files = glob.glob(f"{sf_dir}/{t}.parquet")
    if files:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize floats so -0.0 == 0.0 and representation noise is visible
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def kind_class(s: pd.Series) -> str:
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "O": "str", "M": "ts", "m": "td"}.get(s.dtype.kind, s.dtype.kind)

def dtype_mismatches(s: pd.DataFrame, o: pd.DataFrame):
    """The driver hashes string-rendered cells, so an int64 column on one
    side and float64 on the other ('191030033' vs '191030033.0') is a hash
    miss even when values are identical (DuckDB sum(BIGINT) -> HUGEINT ->
    float64 via pandas is the repeat offender). Flag int-vs-float class
    divergence unless nulls forced pandas' own int->float widening."""
    bad = []
    for c in s.columns:
        ks, ko = kind_class(s[c]), kind_class(o[c])
        if ks == ko:
            continue
        if {ks, ko} == {"int", "float"}:
            f = s[c] if ks == "float" else o[c]
            if f.isna().any():
                continue  # pandas null-widening, not an engine/oracle bug
            bad.append(f"{c}: spark={s[c].dtype} oracle={o[c].dtype}")
        else:
            bad.append(f"{c}: spark={s[c].dtype} oracle={o[c].dtype}")
    return bad

fail = 0
for name in names:
    if name not in oracle:
        print(f"{name}: NO ORACLE (rows-only query)")
        continue
    try:
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
            ignore_index=True)
        duck_df = con.execute(oracle[name]).fetchdf()
        s, o = canon(spark_df), canon(duck_df)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        if rows and schema:
            try:
                pd.testing.assert_frame_equal(s, o, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
                dt = dtype_mismatches(s, o)
                if dt:
                    print(f"{name}: DTYPE MISMATCH rows={len(s)}  " + "; ".join(dt))
                    fail += 1
                    continue
                print(f"{name}: OK rows={len(s)}")
                continue
            except AssertionError as e:
                print(f"{name}: VALUE MISMATCH rows={len(s)}\n  {str(e)[:400]}")
        else:
            print(f"{name}: rows {len(s)} vs {len(o)}, cols {list(s.columns)} vs {list(o.columns)}")
        fail += 1
    except Exception as e:
        print(f"{name}: ERROR {str(e)[:400]}")
        fail += 1
sys.exit(1 if fail else 0)
