#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
named after the testdata tables. Mimics the driver: both sides go
through pandas (`.df()`), columns sorted by name, rows sorted by all
columns (pandas sort_values — crashes on ndarray cells exactly like
the driver does), every cell stringified WITHOUT numeric coercion and
md5-hashed. A DuckDB HUGEINT that pandas renders as float ("1.0") vs
Spark's int ("1") is therefore a FAIL here too, as it is for the
driver.
"""
import hashlib
import json
import sys

import duckdb
import pandas as pd


def frame_hash(df):
    """Driver-alike canonical hash: columns sorted by name, rows sorted by
    all columns, str() of every cell."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        for v in row:
            h.update(str(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest(), df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(spark.columns) != sorted(duck.columns):
            print(f"FAIL {name}: cols spark={sorted(spark.columns)} "
                  f"duck={sorted(duck.columns)}")
            n_fail += 1
            continue
        if len(spark) != len(duck):
            print(f"FAIL {name}: rows spark={len(spark)} duck={len(duck)}")
            n_fail += 1
            continue
        try:
            hs, cs = frame_hash(spark)
            hd, cd = frame_hash(duck)
        except Exception as e:
            print(f"FAIL {name}: hash error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if hs != hd:
            diff = None
            for i in range(len(cs)):
                ra = [str(v) for v in cs.iloc[i]]
                rb = [str(v) for v in cd.iloc[i]]
                if ra != rb:
                    diff = (i, ra, rb)
                    break
            print(f"FAIL {name}: hash mismatch")
            if diff:
                print(f"  cols : {list(cs.columns)}")
                print(f"  row {diff[0]} spark: {diff[1]}")
                print(f"  row {diff[0]} duck : {diff[2]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
