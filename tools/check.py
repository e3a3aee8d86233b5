#!/usr/bin/env python3
"""Local emulator of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each parquet table in sfDir as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, loads the matching Spark parquet result from
<verifyOutDir>/<name>/, sorts columns by name and rows by all columns, and
compares cell values. Dev-only tool (driver-side python libs); the engine
itself is pure Scala/Spark.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort", ignore_index=True, na_position="last")
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(abs(fa), abs(fb))
    try:
        if a != a and b != b:  # NaN-ish (pandas NA)
            return True
    except Exception:
        pass
    return a == b or str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"[FAIL] {name}: no spark output at {spark_path}")
            failures += 1
            continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()

        o, g = norm(oracle), norm(got)
        if list(o.columns) != list(g.columns):
            print(f"[FAIL] {name}: columns differ\n  oracle: {list(o.columns)}\n  spark : {list(g.columns)}")
            failures += 1
            continue
        if len(o) != len(g):
            print(f"[FAIL] {name}: row count oracle={len(o)} spark={len(g)}")
            failures += 1
            continue
        bad = None
        ov, gv = o.values, g.values
        for i in range(len(o)):
            for j in range(len(o.columns)):
                if not cell_eq(ov[i][j], gv[i][j]):
                    bad = (i, o.columns[j], ov[i][j], gv[i][j])
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"[FAIL] {name}: first diff row {i} col {c}: oracle={a!r} spark={b!r}")
            failures += 1
        else:
            print(f"[ OK ] {name}: {len(o)} rows x {len(o.columns)} cols match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
