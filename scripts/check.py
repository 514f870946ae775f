#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate (NOT part of the
library): reads Verify output (<out>/<name>/ parquet + oracle_sql.json),
runs each oracle SQL in DuckDB over the sf tables, and compares
(column-name-sorted, row-sorted) values exactly.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# dev knob: cap DuckDB's thread pool so several check.py instances can
# run side by side (the quadratic dedup oracles at sf0.1 take hours
# sequentially; fanning them out is the only way to finish a full
# 10x-SF verify in one session)
import os as _os
if _os.environ.get("DUCKDB_THREADS"):
    con.execute(f"SET threads={int(_os.environ['DUCKDB_THREADS'])}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0

# Keep SURVEY §2's [q] inventory in lockstep with SparkEntry.queries: every
# `key` [q] token in SURVEY.md must name a registered query and vice versa.
# Skipped automatically on SPARK_GRAFT_ONLY subset runs (oracle has few keys).
import os, re
if not os.environ.get("SPARK_GRAFT_ONLY"):
    survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    declared = set(re.findall(r"`([a-z0-9_]+)`(?:[^`|]*)\[q\]", survey))
    registered = set()
    reg_file = f"{outdir}/registered_queries.json"
    if os.path.exists(reg_file):
        registered = set(json.load(open(reg_file)))
    if registered:
        if declared - registered:
            print(f"FAIL survey-sync: in SURVEY §2 but not registered: {sorted(declared - registered)}")
            fail += 1
        if registered - declared:
            print(f"FAIL survey-sync: registered but missing a SURVEY §2 [q] row: {sorted(registered - declared)}")
            fail += 1
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        if os.environ.get("SPARK_GRAFT_ONLY"):
            continue  # subset Verify run — absent queries weren't requested
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    g = got.sort_values(by=list(got.columns), ignore_index=True)
    e = exp.sort_values(by=list(exp.columns), ignore_index=True)
    # Mirror the driver's representation-sensitive hash: an int64 Spark
    # column vs a float64/object oracle column (DuckDB HUGEINT from a bare
    # SUM(bigint)) hashes differently even when values are equal, so treat
    # integer-vs-float kind mismatches as failures before the value compare.
    kind_bad = [c for c in g.columns
                if {g[c].dtype.kind, e[c].dtype.kind} == {"i", "f"}
                or (g[c].dtype.kind in "if") != (e[c].dtype.kind in "if")]
    if kind_bad:
        print(f"FAIL {name}: dtype-kind mismatch "
              + ", ".join(f"{c}: spark={g[c].dtype} duckdb={e[c].dtype}" for c in kind_bad))
        fail += 1; continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        print(f"ok   {name} ({len(got)} rows)"); ok += 1
    except AssertionError as ex:
        msg = str(ex).split("\n")
        print(f"FAIL {name}: {' | '.join(msg[:6])}")
        # show first differing cells
        for c in g.columns:
            neq = (g[c] != e[c]) & ~(g[c].isna() & e[c].isna())
            if neq.any():
                i = neq.idxmax()
                print(f"     col={c} row={i}: spark={g[c][i]!r} duckdb={e[c][i]!r} (n={int(neq.sum())})")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
