#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
named after the testdata tables. Compares schema (column names), row
count, and values (rows sorted by all columns, columns sorted by name).
"""
import json
import math
import sys

import duckdb


def canon(rows, ncols):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                r.append(("f", round(v, 9) if not math.isnan(v) else "nan"))
            elif isinstance(v, list):
                r.append(("l", tuple(
                    round(x, 9) if isinstance(x, float) else str(x)
                    for x in v)))
            else:
                r.append((type(v).__name__, str(v)))
        out.append(tuple(r))
    out.sort()
    return out


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
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_df.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_df").fetchall()
            duck = con.sql(sql)
            duck_cols = sorted(duck.columns)
            duck_rows = con.sql(
                f"SELECT {', '.join(duck_cols)} FROM duck").fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} "
                  f"duck={len(duck_rows)}")
            n_fail += 1
            continue
        a, b = canon(spark_rows, len(spark_cols)), canon(
            duck_rows, len(duck_cols))
        if a != b:
            bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL {name}: values differ at sorted rows {bad}")
            for i in bad[:2]:
                print(f"  cols : {duck_cols}")
                print(f"  spark: {a[i]}")
                print(f"  duck : {b[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
