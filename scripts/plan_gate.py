#!/usr/bin/env python3
"""Dev-only plan-shape regression gate (NOT part of the library).

Compares a fresh `graft.Plans` dump against the committed baseline so a
rewrite that silently adds an exchange, flips a broadcast join to a
sort-merge join, or introduces a cartesian product fails the dev loop
instead of surfacing as a bench regression two rounds later.

Usage:
  sbt -batch "runMain graft.Plans /root/testdata/sf0.01" | tee /tmp/plans.txt
  python3 scripts/plan_gate.py /tmp/plans.txt            # compare
  python3 scripts/plan_gate.py /tmp/plans.txt --update   # re-baseline

Baseline: scripts/plan_baseline.txt (one `name exch=.. sort=..` line
per query, exactly the Plans output). Drift is ALWAYS a failure; if the
new plan is intentional, re-run with --update and commit the diff —
the git history of the baseline file is the audit trail.
"""
import os, re, sys

BASELINE = os.path.join(os.path.dirname(__file__), "plan_baseline.txt")
LINE = re.compile(r"^(\w+)\s+(exch=.*)$")


def parse(path):
    out = {}
    for raw in open(path):
        m = LINE.match(raw.strip())
        if m:
            # normalize whitespace so column padding can't cause drift
            out[m.group(1)] = re.sub(r"\s+", " ", m.group(2))
    return out


def main():
    fresh_path = sys.argv[1]
    fresh = parse(fresh_path)
    if not fresh:
        print(f"plan-gate: no plan lines parsed from {fresh_path}")
        return 1
    if "--update" in sys.argv:
        names = sorted(fresh)
        with open(BASELINE, "w") as f:
            for n in names:
                f.write(f"{n} {fresh[n]}\n")
        print(f"plan-gate: baseline updated with {len(names)} queries")
        return 0
    if not os.path.exists(BASELINE):
        print("plan-gate: no baseline yet — run with --update first")
        return 1
    base = parse(BASELINE)
    rc = 0
    for n in sorted(set(base) | set(fresh)):
        if n not in fresh:
            print(f"FAIL plan-gate {n}: in baseline but not in fresh dump")
            rc = 1
        elif n not in base:
            print(f"FAIL plan-gate {n}: new query with no baseline "
                  f"(re-run with --update to record it)")
            rc = 1
        elif base[n] != fresh[n]:
            print(f"FAIL plan-gate {n}:\n  baseline {base[n]}\n  fresh    {fresh[n]}")
            rc = 1
    if rc == 0:
        print(f"plan-gate: {len(fresh)} queries, no plan-shape drift")
    return rc


if __name__ == "__main__":
    sys.exit(main())
