#!/usr/bin/env python3
"""Dev-only scratch-scale generator (NOT part of the library): builds a
~10x copy of an sf directory for scale-probing the heavy-tail queries
above the largest driver-provided SF.

Scaling model (mimics true TPC-H-ish SF growth, not data duplication):
- relational tables: 10 key-shifted copies — every FK family shifts by
  the same per-copy offset, so joins align within a copy and the graph
  queries see 10x nodes at the SAME per-key density (parts keep their
  supplier fan-in, customers keep their order counts).
- documents: copy i suffixes every token with "_i" — shingle SETS map
  1:1 per copy (within-copy Jaccard/containment preserved exactly,
  cross-copy similarity exactly 0), so the corpus has 10x docs, 10x
  near-dup pairs, and the same document-frequency distribution shape —
  what a genuinely larger corpus looks like to the dedup family.
- embeddings: copy i rotates each vector by i positions (norms and
  within-copy neighbor structure preserved; cross-copy neighbors
  scrambled) and shifts vec_id, so ANN queries see 10x corpus AND the
  proportionally larger vec_id%50 query set.
- region/nation/events: copied as-is (no probed query scales on them;
  Bench's warmup just needs the files present).

Usage: python3 scripts/gen_scale_probe.py [outdir] [copies]
"""
import sys, os, shutil
import duckdb

src = "/root/testdata/sf0.1"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFF = 100_000_000  # per-copy key shift, far above any sf0.1 key

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

for t in ["region", "nation", "events"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

def scale(table, keycols, extra_replace=None):
    """UNION ALL of `copies` key-shifted copies; keys keep BIGINT type."""
    sels = []
    for i in range(copies):
        reps = [f"CAST({k} + {i * OFF} AS BIGINT) AS {k}" for k in keycols]
        if extra_replace:
            reps.append(extra_replace(i))
        sels.append(
            f"SELECT * REPLACE ({', '.join(reps)}) FROM '{src}/{table}.parquet'")
    q = " UNION ALL ".join(sels)
    con.execute(f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

scale("customer", ["c_custkey"])
scale("supplier", ["s_suppkey"])
scale("part", ["p_partkey"])
scale("orders", ["o_orderkey", "o_custkey"])
scale("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
scale("documents", ["doc_id"],
      extra_replace=lambda i:
      ("text AS text" if i == 0 else
       f"array_to_string(list_transform(string_split(text, ' '), "
       f"w -> w || '_{i}'), ' ') AS text"))
scale("embeddings", ["vec_id"],
      extra_replace=lambda i:
      ("embedding AS embedding" if i == 0 else
       f"list_concat(embedding[{i + 1}:], embedding[1:{i}]) AS embedding"))
print(f"done -> {out}")
