#!/usr/bin/env python3
"""Dev-only paired pinned-jar A/B bench controller (r17 verdict #1).

Holds TWO resident graft.BenchServer JVMs — A = the pinned r17 jar,
B = the current build — and for each query alternates attempt blocks
A/B/A/B within one continuous session on one host, so co-tenancy
drift hits both sides of every pair. Per-query output: both sides'
attempt vectors, medians, and the B/A ratio; summary: median ratio,
per-phase host fingerprints (load1/steal), and the named heavy-tail
movers' attribution.

Usage:
  scripts/paired_bench.py <jarA> <jarB> <queries.txt> <out.json>
    [--attempts-per-block 2] [--blocks 2] [--sf /root/testdata/sf0.1]
"""
import json, os, subprocess, sys, time

ADDOPENS = []
for p in ("java.lang java.lang.invoke java.lang.reflect java.io java.net "
          "java.nio java.util java.util.concurrent java.util.concurrent.atomic "
          "sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar").split():
    ADDOPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]


def host_snap():
    load1 = float(open("/proc/loadavg").read().split()[0])
    cpu = open("/proc/stat").readline().split()[1:]
    cpu = [int(x) for x in cpu]
    steal = cpu[7] if len(cpu) > 7 else -1
    return {"load1": load1, "steal_ticks": steal, "total_ticks": sum(cpu),
            "t": time.time()}


def steal_pct(pre, post):
    dt = post["total_ticks"] - pre["total_ticks"]
    if dt <= 0 or pre["steal_ticks"] < 0:
        return -1.0
    return 100.0 * (post["steal_ticks"] - pre["steal_ticks"]) / dt


class Server:
    def __init__(self, name, jar, sf, heap):
        self.name = name
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32")
        cmd = (["java"] + ADDOPENS +
               [f"-Xmx{heap}", "-XX:ReservedCodeCacheSize=512m",
                "-XX:+UseCodeCacheFlushing", "-Dspark.ui.enabled=false",
                "-Dspark.sql.session.timeZone=UTC",
                "-cp", f"{jar}:/opt/spark/jars/*", "graft.BenchServer"])
        self.p = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                  stdout=subprocess.PIPE,
                                  stderr=open(f"/tmp/paired_{name}.err", "w"),
                                  text=True, bufsize=1, env=env)
        for line in self.p.stdout:
            if line.strip() == "READY":
                break
        print(f"[paired] {name} READY", file=sys.stderr)

    def run(self, q, n, warm):
        self.p.stdin.write(f"RUN {q} {n} {'warm' if warm else 'nowarm'}\n")
        self.p.stdin.flush()
        for line in self.p.stdout:
            line = line.strip()
            if line.startswith(f"RESULT {q} "):
                parts = line.split(" ")
                ts, gcs = json.loads(parts[2]), json.loads(parts[3])
                # ok-flags per attempt (r18 advice #1); a pinned jar
                # predating the field reports all-ok (its attempts were
                # trusted under the old protocol — flagging is forward)
                oks = json.loads(parts[4]) if len(parts) > 4 else [1] * len(ts)
                return ts, gcs, oks
            if line.startswith("ERR"):
                raise RuntimeError(f"{self.name}: {line}")
        raise RuntimeError(f"{self.name} died mid-query {q}")

    def stop(self):
        try:
            self.p.stdin.write("EXIT\n")
            self.p.stdin.flush()
            self.p.wait(timeout=60)
        except Exception:
            self.p.kill()


def med(xs):
    s = sorted(xs)
    return s[(len(s) - 1) // 2]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), True)
                for a in sys.argv[1:] if a.startswith("--"))
    jar_a, jar_b, qfile, out = args[:4]
    per_block = int(opts.get("attempts-per-block", 2))
    blocks = int(opts.get("blocks", 2))
    sf = opts.get("sf", "/root/testdata/sf0.1")
    heap = opts.get("heap", "40g")
    queries = [q.strip() for q in open(qfile) if q.strip()]

    snap0 = host_snap()
    a = Server("A_r17", jar_a, sf, heap)
    b = Server("B_cur", jar_b, sf, heap)
    snap_ready = host_snap()
    results = {}
    try:
        for qi, q in enumerate(queries):
            pre = host_snap()
            ta, tb, ga, gb = [], [], [], []
            fa = fb = 0  # failed attempts per side (excluded from medians)
            for blk in range(blocks):
                warm = blk == 0
                ra = a.run(q, per_block, warm)
                rb = b.run(q, per_block, warm)
                ta += [t for t, o in zip(ra[0], ra[2]) if o]
                ga += [g for g, o in zip(ra[1], ra[2]) if o]
                fa += ra[2].count(0)
                tb += [t for t, o in zip(rb[0], rb[2]) if o]
                gb += [g for g, o in zip(rb[1], rb[2]) if o]
                fb += rb[2].count(0)
            post = host_snap()
            # a side with zero successful attempts has no median; the pair
            # is recorded as failed, never as a (fast) timing
            ma = med(ta) if ta else None
            mb = med(tb) if tb else None
            ratio = round(mb / ma, 4) if ma and mb and ma > 0 else None
            results[q] = {
                "a_attempts": ta, "b_attempts": tb,
                "a_gc_ms": ga, "b_gc_ms": gb,
                "a_failed_attempts": fa, "b_failed_attempts": fb,
                "a_med": ma, "b_med": mb,
                "ratio_b_over_a": ratio,
                "load1": [pre["load1"], post["load1"]],
                "steal_pct": round(steal_pct(pre, post), 3),
            }
            fmt = lambda v: f"{v:.3f}" if v is not None else "FAIL"
            print(f"[paired] {qi+1}/{len(queries)} {q:28s} "
                  f"A={fmt(ma)} B={fmt(mb)} ratio={fmt(ratio)} "
                  f"fails={fa}/{fb} load1={post['load1']:.2f}", file=sys.stderr)
    finally:
        a.stop(); b.stop()
    snap_end = host_snap()

    ratios = sorted(r["ratio_b_over_a"] for r in results.values()
                    if r["ratio_b_over_a"])
    summary = {
        "protocol": (f"resident-dual-jvm ABAB: {blocks} blocks x {per_block} "
                     f"attempts/side/query, warm1 first block, heap {heap}/side, "
                     "local[32], same host, interleaved per query"),
        "jar_a": jar_a, "jar_b": jar_b, "sf": sf,
        "n_queries": len(ratios),
        "median_ratio": med(ratios) if ratios else None,
        "min_ratio": ratios[0] if ratios else None,
        "max_ratio": ratios[-1] if ratios else None,
        "n_over_1.2": sum(1 for r in ratios if r > 1.2),
        "n_under_0.8": sum(1 for r in ratios if r < 0.8),
        "n_failed_pairs": sum(1 for r in results.values()
                              if r["ratio_b_over_a"] is None),
        "n_failed_attempts": sum(r["a_failed_attempts"] + r["b_failed_attempts"]
                                 for r in results.values()),
        "host": {"start": snap0, "ready": snap_ready, "end": snap_end,
                 "steal_pct_overall": round(steal_pct(snap0, snap_end), 3)},
    }
    json.dump({"summary": summary, "queries": results}, open(out, "w"), indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
