#!/usr/bin/env python3
"""Dev-only oracle-cliff lint (NOT part of the library): the dynamic half
of the two-part lint from the r16 verdict #3. Six oracle-evaluation cliff
classes were found in r15/r16 by paying for expensive scale verifies:

  1. all-pairs pair joins (list_intersect self-join)
  2. plain-CTE exponential re-inlining of multiply-referenced chains
  3. a filter above an inequality join
  4. equality bound to the wrong table in a multi-join
  5. DECIMAL width the engine silently promotes
  6. double->decimal emission of SF-growing absolute values

Classes 1/2/5/6 (plus a tripwire for 3) have STATIC pattern rules in
OracleLintSpec.scala, which parses ORACLE_ALLOW below so there is no
second adjudication list to drift. Classes 3/4 are plan-shaped: this
probe runs every oracle under EXPLAIN ANALYZE at a SMALL sf and flags
any oracle whose largest actual operator cardinality or wall time blows
past the bars - the all-pairs/wrong-binding/unpushed-filter cliffs all
show up as an operator emitting orders of magnitude more rows than the
inputs, long before the SF where they become un-runnable.

Usage: python3 scripts/oracle_lint.py <sfDir> <verifyOutDir> [out.json]
  (verifyOutDir must contain oracle_sql.json from a graft.Verify run)
Self-test: python3 scripts/oracle_lint.py --selftest <sfDir>
  (seeded class-3/4 violations must exceed the bars -> proves the probe fires)
"""
import json, re, sys, time
import duckdb

# Adjudicated static-rule hits: key -> {rule: why}. OracleLintSpec parses
# this block (ORACLE_ALLOW_BEGIN/END markers) and enforces BOTH halves:
# every hit must be allowed, and every allow must still hit (no dead rows).
# ORACLE_ALLOW_BEGIN
ORACLE_ALLOW = {
    # cte-reinline: fixed-K iterative unrolls. DuckDB 1.0 re-inlines plain
    # CTEs per reference, so K levels of 2-reference chains cost 2^K body
    # copies - but each body here is bounded (node-, centroid-, or
    # vocab-sized, never row-quadratic) and the whole family is sf1
    # wall-green (FULLVERIFY_sf1_r16).
    "q_hits": {"cte-reinline": "5-round unroll; edge-sized bodies; sf1 green"},
    "q_kcore": {"cte-reinline": "peel unroll; node-sized bodies; sf1 green"},
    "q_pagerank": {"cte-reinline": "5-iteration unroll; node+edge bodies; sf1 green"},
    "q_two_hop": {"cte-reinline": "pair CTE referenced by bounded aggregates; sf1 green"},
    # (sim_ivf_kmeans WAS the live instance of this class - 12000 inline
    # copies, 44 s at sf0.01 - fixed by MATERIALIZED CTEs: 0.3 s,
    # value-identical. The probe found it; the rule now passes clean.)
    "text_bpe_train": {"cte-reinline": "merge-round unroll; vocab-sized bodies; sf1 green"},
    # pure-inequality-join: deliberate bounded all-pairs, never corpus^2 -
    # group-pair stats (k^2 groups), calendar-bounded series pairs, the
    # fenced brute-force truth side of an ANN eval, or a binned range join
    # whose equality key lives in the bin column.
    "an_dunn": {"pure-inequality-join": "group-pair frame, k^2 groups",
                "narrow-decimal-product": "rank-sum square; width certified at sf1; r17 decade-probe list"},
    "an_games_howell": {"pure-inequality-join": "group-pair frame, k^2 groups"},
    "an_hodges_lehmann": {"pure-inequality-join": "two-sample pairs over day-aggregated series"},
    "an_kendall_tau": {"pure-inequality-join": "day-series pairs, calendar-bounded"},
    "an_mann_kendall": {"pure-inequality-join": "day-series pairs, calendar-bounded"},
    "an_somers_d": {"pure-inequality-join": "day-series concordance pairs, calendar-bounded",
                    "narrow-decimal-product": "pair-count product; width certified at sf1; r17 decade-probe list"},
    "an_theil_sen": {"pure-inequality-join": "day-series slope pairs, calendar-bounded"},
    "an_tukey_hsd": {"pure-inequality-join": "group-pair frame, k^2 groups",
                     "narrow-decimal-product": "mean-diff square; q_stat ROUND 6 contract (r16)"},
    "dedup_embedding": {"pure-inequality-join": "pair ordering on the inverted-index candidate base, not all-pairs"},
    "q_range_join": {"pure-inequality-join": "interval containment; the equality key is the bin join beside it"},
    # narrow-decimal-product: the DECIMAL-width scale contracts - widths
    # chosen to fit the certified SF horizon; the sf1 gate verified them
    # and the r17 sf10 decade probe re-certifies (verdict #5 list).
    "an_anova": {"narrow-decimal-product": "eta_sq/F emitted as scale-stable ratios (r16 contract)"},
    "an_brunner_munzel": {"narrow-decimal-product": "rank-variance square; width certified at sf1"},
    "an_cuzick": {"narrow-decimal-product": "trend-weight product; width certified at sf1; r17 decade-probe list"},
    "an_jonckheere": {"narrow-decimal-product": "pair-count product; width certified at sf1; r17 decade-probe list"},
    "an_welch_ttest": {"narrow-decimal-product": "variance term; width certified at sf1"},
    # unrounded-double-sum: double SUMs cast to >=6-decimal-scale DECIMAL
    # without ROUND or normalization. All sf1 hash-green - the summands
    # are per-row bounded and the emitted magnitudes stay inside the
    # double ulp at the cast scale through sf1; the decade probes are the
    # re-certification vehicle for this class (an_anova was the instance
    # that crossed the line and got a ROUND contract in r16).
    "an_autocorr": {"unrounded-double-sum": "lag products of demeaned cents; sf1 green"},
    "an_moran_i": {"unrounded-double-sum": "per-region deviation products of k=25 nation MEANS (not sums) - magnitudes bounded by the balance range at any SF; r17 sf1 green"},
    "an_geary_c": {"unrounded-double-sum": "same k-sized nation-mean deviation frame as an_moran_i; r17 sf1 green"},
    "text_heaps_fit": {"unrounded-double-sum": "ln(cumulative) terms bounded ~40 per checkpoint; checkpoint count grows only logarithmically in token magnitude; r17 sf1 green"},
    "sim_silhouette": {"unrounded-double-sum": "per-vector silhouette terms bounded in [-1,1]; per-cell means divide by the cell count at emission ROUND 6; r17 sf1 green"},
    "an_cochrane_orcutt": {"unrounded-double-sum": "residuals normalized by sqrt(Cyy) BEFORE gathering (bounded <= 1 at any SF); rho/slopes ROUND 6 at emission; r17 sf10 green"},
    "an_breslow_day": {"unrounded-double-sum": "per-stratum (a-at)^2/Var terms feed the scale-free BD/Tarone chi2 ROUND 6; sf10 green (r17)"},
    "an_james_stein": {"unrounded-double-sum": "within-SS and 1/n_g terms feed the scale-free shrinkage ratio c ROUND 6; sf10 green (r17)"},
    "an_corr_matrix": {"unrounded-double-sum": "power sums feed a ratio downstream; sf1 green"},
    "an_durbin_watson": {"unrounded-double-sum": "residual diffs; sf1 green"},
    "an_geometric_mean": {"unrounded-double-sum": "log sums, slow-growing; sf1 green"},
    "an_hurst": {"unrounded-double-sum": "rescaled-range terms; sf1 green"},
    "an_info_gain": {"unrounded-double-sum": "entropy terms bounded by log(n); sf1 green"},
    "an_kruskal": {"unrounded-double-sum": "rank sums feed the H ratio; sf1 green"},
    "an_linreg": {"unrounded-double-sum": "power sums feed slope ratios; sf1 green"},
    "an_outliers": {"unrounded-double-sum": "z-score squares per group; sf1 green"},
    "an_price_elasticity": {"unrounded-double-sum": "log-log power sums; sf1 green"},
    "an_rmst": {"unrounded-double-sum": "survival-area increments, horizon-bounded; sf1 green"},
    "an_seasonal_strength": {"unrounded-double-sum": "component variances feed a ratio; sf1 green"},
    "an_stats_moments": {"unrounded-double-sum": "central-moment sums feed skew/kurt ratios; sf1 green"},
    "an_theil": {"unrounded-double-sum": "entropy terms; sf1 green"},
    "an_twa": {"unrounded-double-sum": "exact integer micros through the double cast; sf1 green"},
    "etl_scale": {"unrounded-double-sum": "per-group z-scale power sums; sf1 green"},
    "q_modularity": {"unrounded-double-sum": "degree products over edges; sf1 green"},
    "sim_diversity": {"pure-inequality-join": "pairwise join over a FIXED 200-row probe set (vec_id < 200 is SF-invariant under the key-shifted scale copies) - 19,900 pairs bounded at any SF; r18 sf10 green",
                      "unrounded-double-sum": "per-pair ROUND-6 cosines bounded in [-1,1] feed the mean-over-19,900 ratio; r18 sf10 green"},
    "etl_value_entropy": {"unrounded-double-sum": "c*ln c profiling gathers feed the H = ln n - S/n per-row ratio downstream, ROUND 6; r18 sf10 green"},
    "an_rayleigh_dow": {"unrounded-double-sum": "7-term exact-count x literal-cosine dot products feed the R/n resultant ratio downstream, ROUND 6; r18 sf10 green"},
    # r19 waves (all four certified at sf10 in FULLVERIFY_sf10_r19_waveA/B)
    "an_kde": {"unrounded-double-sum": "per-point Gaussian kernel terms bounded <= 1 on a FIXED 21-point grid; density ROUND 6; r19 sf10 green"},
    "an_hartley": {"unrounded-double-sum": "per-group variance doubles from exact centered integers feed the scale-free F_max/Cochran-C ratios, ROUND 6; r19 sf10 green"},
    "an_arch_lm": {"unrounded-double-sum": "self-normalized squares x = m^2*u^2/sum(u^2) bounded at any SF; LM scale-free ROUND 6; r19 sf10 green"},
    "text_unigram_xent": {"unrounded-double-sum": "per-doc cross-entropy terms bounded by ln(vocab); bucket means ROUND 6; r19 sf10 green"},
    "an_scheffe": {"pure-inequality-join": "group-pair frame, k^2 groups (the an_tukey_hsd shape)",
                   "narrow-decimal-product": "centered-cents square, same width contract as an_tukey_hsd; F emitted scale-free ROUND 6; r19 sf10 green"},
    "an_woolf": {"unrounded-double-sum": "per-stratum w/lnOR terms over the k~5 strata frame; chi2 and pooled lnOR scale-free ROUND 6; r19 sf10 green"},
    "an_cointegration": {"unrounded-double-sum": "DF regression sums of max-normalized residuals bounded in [-1,1]; rho/t scale-free ROUND 6; r19 sf10 green"},
    # r19 fourth wave (normal-scores family; all three sf10-certified in
    # the wave-4 check logs): per-value Phi^-1 scores bounded ~|6| at
    # any SF, gathered DECIMAL(38,12); every emission is a scale-free
    # ratio (chi2-form or W'), ROUND 6
    "an_van_der_waerden": {"unrounded-double-sum": "count x bounded-score products feed T = sum(A_g^2/n_g)/s^2 scale-free ROUND 6; r19 sf10 green"},
    "an_shapiro_francia": {"unrounded-double-sum": "Blom-score x cents products over the calendar-bounded spine feed the W' correlation ratio ROUND 6; r19 sf10 green"},
    "an_fligner_killeen": {"unrounded-double-sum": "count x bounded-score products feed X2 = sum n_g(Abar_g - abar)^2 / V^2 scale-free ROUND 6; r19 sf10 green"},
    "text_bigram_cond_entropy": {"unrounded-double-sum": "c12*ln(c12/c1) entropy terms feed the per-token H = -S/N ratio downstream, ROUND 6; r18 sf10 green"},
    "an_spectral_entropy": {"unrounded-double-sum": "amplitude-normalized period powers (rev scaled by n\u00b2\u00b710\u2074) feed the p/\u03a3p ratio downstream; entropy gather bounded in [-1/e,0] per term; emission ROUND 6 / ln 59; r18 sf1 green"},
    "sim_ndcg": {"unrounded-double-sum": "DCG terms bounded by 1/log2(rank); sf1 green"},
    "an_watson_u2": {"unrounded-double-sum": "per-tie-run CvM terms (u,e in [0,1]) are each <= run-count/n and sum to W2 <= 1-ish at any SF; one double per run from exact DECIMAL(38,0) integers, DECIMAL(38,12)-gathered order-free; r19"},
}
# ORACLE_ALLOW_END

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# probe bars at the probe SF (sf0.001: largest table ~6k rows). A clean
# oracle's widest operator stays within a small multiple of its inputs;
# an all-pairs/wrong-binding/unpushed-filter cliff is 10^2-10^4 over.
MAX_OP_ROWS = 3_000_000
MAX_WALL_S = 20.0

ROWS_RE = re.compile(r"^\s*[│|]\s*([\d,]+)\s*[│|]")
TIME_RE = re.compile(r"\(\s*[\d.]+s\s*\)")


def probe_one(con, sql):
    """(max actual operator rows, wall seconds) of one EXPLAIN ANALYZE."""
    t0 = time.time()
    rows = con.execute("EXPLAIN ANALYZE " + sql).fetchall()
    wall = time.time() - t0
    txt = "\n".join(r[-1] for r in rows)
    lines = txt.splitlines()
    mx = 0
    for i, line in enumerate(lines):
        m = ROWS_RE.match(line)
        # an operator box prints actual rows on the line ABOVE its (x.xxs)
        if m and i + 1 < len(lines) and TIME_RE.search(lines[i + 1]):
            mx = max(mx, int(m.group(1).replace(",", "")))
    return mx, wall


def connect(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    return con


SEEDED = {
    # class 1/3: all-pairs list-intersect self-join behind a filter the
    # engine cannot push below the inequality join (the r15 dedup-oracle
    # shape before the inverted-index rewrite)
    "seed_allpairs": """
      WITH g AS (SELECT l_orderkey AS id,
                        [l_partkey % 97, l_suppkey % 89, CAST(l_linenumber AS BIGINT)] AS grams
                 FROM lineitem LIMIT 5000)
      SELECT count(*) FROM (
        SELECT a.id, len(list_intersect(a.grams, b.grams)) AS ov
        FROM g a JOIN g b ON a.id < b.id) p
      WHERE ov >= 2""",
    # class 4: pair join bound to a hot key before the narrowing filter -
    # the an_basket_triples join-order cliff in miniature (the fix was a
    # staged pair join; the naive binding explodes on key skew)
    "seed_hot_pair": """
      WITH items AS (SELECT l_orderkey % 200 AS o, l_partkey AS i FROM lineitem)
      SELECT count(*) FROM items a JOIN items b ON a.o = b.o AND a.i < b.i""",
}


def main():
    if sys.argv[1] == "--selftest":
        con = connect(sys.argv[2])
        bad = 0
        for name, sql in SEEDED.items():
            mx, wall = probe_one(con, sql)
            fired = mx > MAX_OP_ROWS or wall > MAX_WALL_S
            print(f"{'FIRED' if fired else 'MISSED'} {name}: max_op_rows={mx} wall={wall:.2f}s")
            bad += 0 if fired else 1
        sys.exit(1 if bad else 0)

    sfdir, outdir = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "ORACLELINT.json"
    con = connect(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    rows, flagged = [], []
    for name, sql in sorted(oracle.items()):
        try:
            mx, wall = probe_one(con, sql)
        except Exception as e:
            rows.append({"key": name, "error": str(e)[:200]})
            flagged.append(name)
            continue
        over = mx > MAX_OP_ROWS or wall > MAX_WALL_S
        allowed = "probe" in ORACLE_ALLOW.get(name, {})
        if over and not allowed:
            flagged.append(name)
        rows.append({"key": name, "max_op_rows": mx, "wall_s": round(wall, 3),
                     "over": over, "allowed": allowed})
    top = sorted((r for r in rows if "max_op_rows" in r),
                 key=lambda r: -r["max_op_rows"])[:10]
    artifact = {
        "artifact": "oraclelint", "sf": sfdir, "n": len(rows),
        "bars": {"max_op_rows": MAX_OP_ROWS, "max_wall_s": MAX_WALL_S},
        "flagged": flagged,
        "top_by_rows": [{"key": r["key"], "max_op_rows": r["max_op_rows"],
                         "wall_s": r["wall_s"]} for r in top],
        "rows": rows,
    }
    json.dump(artifact, open(out, "w"), indent=1)
    print(f"oracle-lint probe: {len(rows)} oracles, flagged={flagged} -> {out}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
