#!/usr/bin/env python3
"""Dev-only: fan out the DuckDB oracle compare over key groups so a
10x/100x-SF verify finishes in one session (the r15 procedure, scripted).

Splits a Verify dump into N group dirs (symlinked query dirs + a
filtered oracle_sql.json each), runs one check.py per group with a
capped DuckDB thread pool and a per-group wall timeout, and leaves the
per-group logs for aggregate_fullverify.py.

Usage:
  scripts/fanout_check.py <sfDir> <verifyOutDir> <logPrefix>
      [--groups 6] [--threads 4] [--timeout 5400]

A key whose group log never prints its verdict (group timed out before
reaching it) simply stays at its previous certification level — the
aggregate only records keys with an explicit ok/FAIL line.
"""
import json, os, subprocess, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:] if "=" in a and a.startswith("--"))
sfdir, outdir, logprefix = args[:3]
n_groups = int(opts.get("groups", 6))
threads = int(opts.get("threads", 4))
timeout = int(opts.get("timeout", 5400))

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# only keys whose spark dump exists (subset Verify runs dump a subset)
keys = sorted(k for k in oracle if os.path.isdir(f"{outdir}/{k}"))
groups = [keys[i::n_groups] for i in range(n_groups)]

procs = []
for gi, gkeys in enumerate(groups):
    if not gkeys:
        continue
    gdir = f"{outdir}_g{gi}"
    os.makedirs(gdir, exist_ok=True)
    json.dump({k: oracle[k] for k in gkeys}, open(f"{gdir}/oracle_sql.json", "w"))
    for k in gkeys:
        dst = f"{gdir}/{k}"
        if not os.path.islink(dst) and not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{outdir}/{k}"), dst)
    log = f"{logprefix}_g{gi}.log"
    env = dict(os.environ, DUCKDB_THREADS=str(threads), SPARK_GRAFT_ONLY="1")
    p = subprocess.Popen(
        ["timeout", str(timeout), "python3",
         os.path.join(os.path.dirname(__file__), "check.py"), sfdir, gdir],
        stdout=open(log, "w"), stderr=subprocess.STDOUT, env=env)
    procs.append((gi, p, log))
    print(f"group {gi}: {len(gkeys)} keys -> {log}")

rc = 0
for gi, p, log in procs:
    r = p.wait()
    tail = open(log).read().strip().splitlines()[-1:] or [""]
    print(f"group {gi} exit={r}: {tail[0]}")
    if r not in (0, 1):  # 1 = compare failures (reported per key); >1 = timeout/crash
        rc = max(rc, r)
sys.exit(rc)
