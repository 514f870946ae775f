#!/usr/bin/env python3
"""Dev-only generator for SURVEY_INVENTORY.json (r17 verdict #5): the
machine-readable operator inventory — key → section, full contract
description (moved verbatim out of SURVEY §2's prose cells), oracle
kind, highest SF certification level, and plan-gate adjudications.

Sources (all already-committed artifacts / code, no re-execution):
  - SURVEY.md §2 [q] rows            → section, description
  - a Verify dump's oracle_sql.json  → oracle kind (sql/rows)
  - FULLVERIFY_*.json artifacts      → sf certification level
  - scripts/plan_gate.py             → EXCH_ALLOW / GWIN_ALLOW entries

Usage: scripts/gen_inventory.py <verifyOutDir> > /tmp/inv.json
       && mv /tmp/inv.json SURVEY_INVENTORY.json
(write to a TEMP file first — the script READS the existing
SURVEY_INVENTORY.json to preserve archived full contracts, so a direct
`> SURVEY_INVENTORY.json` truncates its own input.)
"""
import json, os, re, sys

root = os.path.join(os.path.dirname(__file__), "..")
verify_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"

survey = open(os.path.join(root, "SURVEY.md")).read()

# --- §2 rows: `key` [q] | description | oracle, under ### section headers
sections = {}
desc = {}
cur = None
in_s2 = False
for line in survey.splitlines():
    if line.startswith("## §2"):
        in_s2 = True
    elif line.startswith("## §") and in_s2:
        break
    elif in_s2 and line.startswith("### "):
        cur = line[4:].split("(")[0].strip().rstrip(" —-0123456789pass/+ ")
        cur = line[4:].strip()
    elif in_s2 and line.startswith("|"):
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) >= 2:
            # [q] keys appear in the key cell (plain operator rows) OR in
            # the oracle cell (component rows like sinks/Snapshots whose
            # query key is the promoted round-trip digest)
            for m in re.finditer(r"`([a-z0-9_]+)`(?:[^`|]*)\[q\]", line):
                k = m.group(1)
                sections[k] = cur
                desc[k] = cells[1] if cells[1] else cells[0]

registered = set(json.load(open(f"{verify_dir}/registered_queries.json")))
oracle_sql = set(json.load(open(f"{verify_dir}/oracle_sql.json")).keys())

# The r18 SURVEY trim moved the FULL contract prose into this JSON and
# left truncated ("…"-terminated) cells in §2 — on regeneration, a
# truncated survey cell must NOT overwrite the archived full contract.
# A rewritten (non-"…") cell wins: editing SURVEY stays the way to
# change a contract.
prev_path = os.path.join(root, "SURVEY_INVENTORY.json")
if os.path.exists(prev_path):
    prev = json.load(open(prev_path)).get("keys", {})
    for k, d in list(desc.items()):
        if d.endswith("…") and k in prev and len(prev[k].get("description", "")) > len(d):
            desc[k] = prev[k]["description"]

# --- SF certification: highest decade a key appears "ok" in
sf_level = {}
for fname, level in [
    ("FULLVERIFY_sf01_r15.json", "sf0.1"),
    ("FULLVERIFY_sf1_r16.json", "sf1"),
    ("FULLVERIFY_sf1_r17_wave2.json", "sf1"),
    ("FULLVERIFY_sf10_r17.json", "sf10"),
    ("FULLVERIFY_sf10_r17_wave2.json", "sf10"),
    ("FULLVERIFY_sf1_r18_wave.json", "sf1"),
    ("FULLVERIFY_sf10_r18_wave.json", "sf10"),
    ("FULLVERIFY_sf1_r19_wave.json", "sf1"),
    ("FULLVERIFY_sf10_r19_waveA.json", "sf10"),
    ("FULLVERIFY_sf10_r19_waveB.json", "sf10"),
    ("FULLVERIFY_sf10_r19_waveC.json", "sf10"),
    ("FULLVERIFY_sf10_r19_waveD.json", "sf10"),
    # (FULLVERIFY_sf10_heavy_r18 is a bounded-heap COMPLETION probe, not
    # a hash certification - deliberately not on this ladder)
]:
    p = os.path.join(root, fname)
    if not os.path.exists(p):
        continue
    order = {"sf0.01": 0, "sf0.1": 1, "sf1": 2, "sf10": 3}
    for k, v in json.load(open(p)).get("keys", {}).items():
        # values carry annotations ("ok (oracle rewritten...)",
        # "bound-certified" for the sketch keys' documented compaction
        # regime) — both count as certification at that level
        if ((v.startswith("ok") or v.startswith("bound-certified"))
                and order[level] > order.get(sf_level.get(k, "sf0.01"), 0)):
            sf_level[k] = level
            if v.startswith("bound-certified"):
                sf_level[k + "::bound"] = level

# --- plan adjudications out of plan_gate.py (the audited allowlists)
gate = open(os.path.join(root, "scripts", "plan_gate.py")).read()


def parse_dict_block(name):
    m = re.search(name + r"\s*=\s*\{(.*?)\n\}", gate, re.S)
    return m.group(1) if m else ""


gwin = dict(re.findall(r'"([a-z0-9_]+)":\s*(\d+)', parse_dict_block("GWIN_ALLOW")))
exch = {}
for m in re.finditer(r'"([a-z0-9_]+)":\s*\((\d+),\s*(\d+),\s*"(.*?)"\)',
                     parse_dict_block("EXCH_ALLOW"), re.S):
    exch[m.group(1)] = {"exch_max": int(m.group(2)), "reuse_min": int(m.group(3)),
                        "why": re.sub(r"\s+", " ", m.group(4))}

inv = {}
for k in sorted(registered):
    e = {
        "section": sections.get(k, "?"),
        "description": desc.get(k, ""),
        "oracle": "sql" if k in oracle_sql else "rows",
        "sf_certified": sf_level.get(k, "sf0.01"),
    }
    if k + "::bound" in sf_level:
        e["bound_certified"] = True  # self-certified error bound, not a hash
    if k in gwin:
        e["gwin_allow"] = int(gwin[k])
    if k in exch:
        e["exch_allow"] = exch[k]
    inv[k] = e

missing_desc = [k for k in registered if k not in desc]
extra = [k for k in desc if k not in registered]
out = {
    "n_keys": len(inv),
    "oracle_sql": sum(1 for e in inv.values() if e["oracle"] == "sql"),
    "oracle_rows": sum(1 for e in inv.values() if e["oracle"] == "rows"),
    "sync": {"survey_missing": sorted(missing_desc),
             "survey_extra": sorted(extra)},
    "keys": inv,
}
json.dump(out, sys.stdout, indent=0)
print("", file=sys.stderr)
print(f"[inventory] {len(inv)} keys, {out['oracle_sql']} sql / "
      f"{out['oracle_rows']} rows; missing_desc={missing_desc} extra={extra}",
      file=sys.stderr)
sys.exit(1 if (missing_desc or extra) else 0)
