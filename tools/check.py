#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
named after the testdata tables. Mimics the driver EXACTLY on both
sides: the Spark parquet is read with pandas.read_parquet (pyarrow) —
NOT through DuckDB — because the two readers render out-of-int64
decimals differently (pyarrow keeps a Decimal object, DuckDB→pandas
collapses to float64), and reading both sides through DuckDB masks
that whole bug class (the r8 d12 failure). The oracle side runs in
DuckDB and comes back via `.df()`, as in the driver. Columns sorted
by name, rows sorted by all columns (pandas sort_values — crashes on
ndarray cells exactly like the driver does), every cell stringified
WITHOUT numeric coercion and md5-hashed.

Additionally audits every Spark output column for int/Decimal values
outside the int64 range: such columns stringify asymmetrically between
pyarrow (Decimal object) and DuckDB→pandas (float64), so they are
reported as failures even if today's hash happens to match. DOUBLE
columns are deliberately NOT audited — both readers surface them as
float64, so their str() forms agree at any magnitude.
"""
import hashlib
import json
import sys
from decimal import Decimal

import duckdb
import pandas as pd

INT64_MAX = (1 << 63) - 1
INT64_MIN = -(1 << 63)


def int64_overflow_cols(df):
    """Columns holding int/Decimal values outside int64 — the class of
    value the driver's two parquet readers stringify differently
    (floats render identically on both paths and are not audited)."""
    bad = []
    for c in df.columns:
        s = df[c].dropna()
        if s.empty:
            continue
        try:
            vals = [v for v in s if isinstance(v, (int, Decimal))]
            if any(v > INT64_MAX or v < INT64_MIN for v in vals):
                bad.append(c)
        except TypeError:
            continue
    return bad


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
            # pyarrow read, as the driver does — NOT DuckDB, which would
            # collapse >int64 decimals to float64 on both sides and hide
            # the asymmetry the driver sees.
            spark = pd.read_parquet(f"{out_dir}/{name}")
            duck = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        over = int64_overflow_cols(spark)
        if over:
            print(f"FAIL {name}: columns exceed int64 (render asymmetry "
                  f"pyarrow-vs-duckdb): {over}")
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
