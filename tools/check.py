#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify
output parquet against the DuckDB oracle on the same sf dir and compare
values exactly (columns sorted by name, rows in emitted order).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # run in UTC regardless of host TZ: Spark-written inputs (e.g. the
    # MakeScaled 10x staging) carry isAdjustedToUTC=true timestamps,
    # which DuckDB surfaces as TIMESTAMPTZ rendered in the session TZ
    con.sql("SET timezone = 'UTC'")
    for t in TABLES:
        # driver testdata stages single files; Spark-written staging
        # (tools.MakeScaled) stages part-file directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # exact value compare, mirroring a hash over stringified cells
        mism = []
        for c in got.columns:
            a, b = got[c], want[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                mism.append(f"{c}[{i}]: {a[i]!r} != {b[i]!r} ({neq.sum()} cells)")
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
