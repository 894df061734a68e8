#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run
the matching SQL from oracle_sql.json in DuckDB over views of the sfDir
tables, then compare after sorting columns by name and rows by all columns
(the driver sorts columns by name before hashing values).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            duck_df = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            failures += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failures += 1; continue
        # row-order-insensitive compare (sort by all columns)
        cols = list(spark_df.columns)
        a = spark_df.sort_values(cols, na_position="first").reset_index(drop=True)
        b = duck_df.sort_values(cols, na_position="first").reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(a)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            # show first differing rows
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"  first diff row {i}:\n  spark: {a.loc[i].to_dict()}\n  duck:  {b.loc[i].to_dict()}")
            failures += 1
    queries_without_oracle = [d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                              if "/" in d and d.split("/")[-1] not in oracle
                              and not d.endswith(".json")]
    if queries_without_oracle:
        print("rows-only (no oracle):", sorted(queries_without_oracle))
    print("FAILURES:", failures)
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
