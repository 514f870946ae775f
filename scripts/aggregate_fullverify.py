#!/usr/bin/env python3
"""Dev-only: aggregate the fan-out sf0.1 compare logs into one
FULLVERIFY summary (JSON line per key: ok/fail + row count), so the
parallelized 10x gate leaves a single auditable artifact.

Usage: python3 scripts/aggregate_fullverify.py <log-or-dir> ... > out
Each arg is a check.py log file; later logs OVERRIDE earlier ones for
the same key (re-verification after a fix wins).
"""
import json, re, sys

# keys may be hyphenated (check.py's non-query failures, e.g.
# "FAIL survey-sync: ..."), so [\w-]+ — and any FAIL line the pattern
# still can't parse is counted rather than silently dropped
LINE = re.compile(r"^(ok|FAIL)\s+([\w-]+)(?::|\s)\s*(?:\((\d+) rows\))?")
results = {}
unparsed_fail = []
for path in sys.argv[1:]:
    try:
        for raw in open(path):
            m = LINE.match(raw)
            if m:
                status, key, rows = m.group(1), m.group(2), m.group(3)
                results[key] = {"status": status,
                                "rows": int(rows) if rows else None,
                                "log": path}
            elif raw.startswith("FAIL"):
                unparsed_fail.append({"log": path, "line": raw.strip()[:200]})
    except FileNotFoundError:
        pass
ok = sum(1 for v in results.values() if v["status"] == "ok")
fail = sorted(k for k, v in results.items() if v["status"] == "FAIL")
print(json.dumps({"n_keys": len(results), "ok": ok,
                  "fail": fail,
                  "unparsed_fail": unparsed_fail,
                  "keys": {k: results[k]["status"] for k in sorted(results)}},
                 indent=None, separators=(",", ":")))
