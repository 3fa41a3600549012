#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

For each subdir <name> in verifyOutDir (Spark parquet result) with an
entry in oracle_sql.json, runs the SQL in DuckDB against views over the
sfDir parquet tables, then compares: schema (column names sorted),
row count, and values (rows sorted, exact match + max numeric delta).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(out_dir, sf_dir):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        a = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
        b = duck_df[d_cols].sort_values(d_cols).reset_index(drop=True)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        max_delta, exact = 0.0, True
        for c in s_cols:
            av, bv = a[c].tolist(), b[c].tolist()
            for x, y in zip(av, bv):
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    if x != y:
                        exact = False
                        max_delta = max(max_delta, abs(x - y))
                elif str(x) != str(y):
                    exact = False
                    max_delta = math.inf
        if exact:
            print(f"PASS {name}: {len(a)} rows exact")
            n_pass += 1
        elif max_delta < 1e-9:
            print(f"SOFT {name}: {len(a)} rows, max_delta={max_delta:.2e} "
                  "(not bit-exact — may fail a hash compare)")
            n_fail += 1
        else:
            print(f"FAIL {name}: value mismatch, max_delta={max_delta}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
