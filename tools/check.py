#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify
output parquet against the DuckDB oracle on the same sf dir and compare
values exactly (columns sorted by name, rows in emitted order).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The canonical recursive-closure fragment shared by the transitive-dedup
# oracles (q_dedup_cc / q_dedup_incr / q_pipeline_corpus2). DuckDB's
# recursive CTE materializes (id, reachable) PATH PAIRS — quadratic in
# cluster size — which times out at sf1-equivalent scale even though the
# engine side finishes fine. When present, the closure is computed
# ITERATIVELY instead: the non-recursive prefix yields the edge set, a
# union-find labels each node with its component minimum (exactly what
# min(r) over the reachable set computes, since edges are symmetric), and
# the label table is injected back as `lbl`. Equivalence is not assumed:
# at sf0.01 the recursive oracle passes against the engine, and this
# rewrite passes against the same engine dump, so the two oracles agree
# wherever both can run.
REACH_FRAGMENT = (
    "reach(id, r) AS (SELECT src, src FROM edges "
    "UNION SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst), "
    "lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)")


def iterative_closure(con, sql):
    """Run `sql` with its recursive-closure core replaced by a union-find
    computed in Python over the edge set the non-recursive prefix defines.
    """
    import pandas as pd

    prefix = sql.split(", " + REACH_FRAGMENT)[0]
    edges = con.sql(prefix + " SELECT src, dst FROM edges").fetchall()
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = {v for e in edges for v in e}
    lbl_py = pd.DataFrame(
        {"id": list(ids), "cluster_id": [find(i) for i in ids]},
        dtype="int64")
    con.register("lbl_py", lbl_py)
    try:
        return con.sql(sql.replace(
            REACH_FRAGMENT,
            "lbl AS (SELECT id, cluster_id FROM lbl_py)")).df()
    finally:
        con.unregister("lbl_py")


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
        t0 = time.monotonic()
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            if ", " + REACH_FRAGMENT in sql:
                want = iterative_closure(con, sql)
            else:
                want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
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
            print(f"PASS {name} ({len(got)} rows) [{dt:.1f}s]")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
