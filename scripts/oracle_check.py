#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Verify.scala
parquet dumps (sort columns by name, sort rows, hash values).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <out>"` first)
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints to int64, bytes to hex, then sort rows
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = canon(pq.read_table(files[0]).to_pandas())
            duck_df = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ok_shape = spark_df.shape == duck_df.shape and \
                   list(spark_df.columns) == list(duck_df.columns)
        if not ok_shape:
            print(f"FAIL {name}: shape/cols spark={spark_df.shape}{list(spark_df.columns)} duck={duck_df.shape}{list(duck_df.columns)}")
            n_fail += 1; continue
        # The driver hashes rendered values, so an int column on one side
        # vs float on the other (e.g. DuckDB HUGEINT -> float64) is a real
        # failure even when the numbers compare equal ("5" != "5.0").
        kinds = [(c, spark_df[c].dtype.kind, duck_df[c].dtype.kind)
                 for c in spark_df.columns
                 if spark_df[c].dtype.kind != duck_df[c].dtype.kind]
        if kinds:
            print(f"FAIL {name}: dtype-kind mismatch {kinds}")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(spark_df, duck_df,
                                          check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            print(f"FAIL {name}: " + " | ".join(msg[:6])); n_fail += 1
    # rows-only checks for queries without oracles
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            n = pq.read_table(files[0]).num_rows if files else 0
            print(f"{'ROWS' if n>0 else 'FAIL'} {name}: {n} rows")
            if n == 0: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
