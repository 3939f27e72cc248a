#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <out>/<query> parquet (Spark result), runs the matching SQL
from <out>/oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares: schema (sorted column names), row count, and a hash of the
column-name-sorted, row-sorted values.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"ERROR   {name}: {str(e).splitlines()[0][:150]}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA  {name}: spark={list(got.columns)} duck={list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"ROWS    {name}: spark={len(got)} duck={len(want)}"); n_fail += 1; continue
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            ndiff = int(diff.any(axis=1).sum())
            if ndiff == 0:
                eq = True  # NaN-only differences
        if eq:
            print(f"PASS    {name} ({len(got)} rows)"); n_pass += 1
        else:
            print(f"VALUES  {name}: {ndiff}/{len(got)} rows differ")
            bad = diff.any(axis=1)
            print("  spark:", got[bad].head(3).to_dict("records"))
            print("  duck :", want[bad].head(3).to_dict("records"))
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
