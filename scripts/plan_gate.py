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

# HARD rule, independent of the baseline (so --update cannot bless a
# violation): gwin (Plans.unboundedGlobalWindows — a Window with an
# empty partition spec whose input subtree is NOT limit-bounded, i.e. a
# SinglePartition exchange over a potentially data-sized frame) must be
# 0 for every query not on this audited allowlist. Allowlisted frames
# are bounded BY SOURCE, invisible to the structural detector:
#   - day-spine series (dailyRevenueSpine: calendar-bounded, ≤ ~2500
#     rows at ANY scale factor): an_autocorr, an_bollinger, an_rsi,
#     an_cvm, an_max_drawdown, the SPC/changepoint/forecast family,
#     an_hurst's multi-scale windows, an_theil_sen's day pairs …
#   - distinct-event-time survival curves (≤ day-spine cardinality):
#     an_kaplan_meier, an_nelson_aalen, an_greenwood, an_median_survival,
#     an_rmst
#   - group-cardinality offset/rank frames (key-domain-sized: order
#     priorities, deciles, hypothesis lists, null-pattern combos):
#     an_quantiles_by_group, an_weighted_median, an_winsorize,
#     an_trimmed_mean, an_quartile_skew, an_decile_lift, an_bh_fdr,
#     an_qte, an_mad_outliers, etl_null_patterns
# A NEW query with gwin > 0 fails until its frame is audited and the
# entry added here — the audit trail is this file's git history, and
# the boundedness claim itself is machine-checked: GwinAuditSpec parses
# THIS dict and fails any entry whose frame row-count scales with SF
# (10× data → >3× frame without saturation at the next step).
GWIN_ALLOW = {
    "an_autocorr": 2, "an_bartels_rank": 2, "an_bh_fdr": 2, "an_bollinger": 3,
    "an_by_fdr": 2,
    "an_cusum_sq": 4, "an_foster_stuart": 1, "an_goldfeld_quandt": 2,
    "an_snht": 1, "an_theil_u": 1, "an_tracking_signal": 2,
    "an_diebold_mariano": 2, "an_cuminc": 4,
    "an_kpss": 1, "an_sprt": 2,
    "an_pettitt": 4, "an_buishand": 1, "an_von_neumann": 1,
    "an_cox_stuart": 2, "an_granger": 1, "an_cochrane_orcutt": 2,
    "an_changepoint": 2, "an_conformal": 1, "an_cvm": 1, "an_decile_lift": 1,
    "an_durbin_watson": 1, "an_ewma": 1,
    "an_forecast_naive": 1, "an_greenwood": 3, "an_hurst": 6,
    "an_kaplan_meier": 2, "an_kendall_w": 1, "an_ljung_box": 1,
    "an_mad_outliers": 2,
    "an_max_drawdown": 1, "an_mean_shift": 1, "an_median_survival": 2,
    "an_moods_median": 3,
    "an_nelson_aalen": 3, "an_newey_west": 1, "an_pacf": 1,
    "an_page_hinkley": 3, "an_page_trend": 1,
    "an_peaks": 1, "an_qte": 1, "an_quade": 1, "an_quantiles_by_group": 1,
    "an_quartile_skew": 1, "an_rmst": 2, "an_rsi": 2, "an_runs_test": 2,
    "an_runs_updown": 2, "an_seasonal_decompose": 1,
    "an_seasonal_strength": 2, "an_spc_rules": 1, "an_spearman": 2,
    "an_streaks": 2, "an_theil_sen": 4, "an_trimmed_mean": 1,
    "an_var_es": 3, "an_wasserstein": 2, "an_weighted_median": 1,
    "an_winsorize": 1, "an_xmr": 1, "etl_null_patterns": 1,
    "etl_volume_anomaly": 1,
    # r19 wave: turning-points / difference-sign scan the day spine
    # (calendar-bounded lead/lag); yuen's two windows are the per-group
    # rank-offset frames over the 2-segment key domain (the
    # an_trimmed_mean probes shape, instantiated once per pivot branch)
    "an_turning_points": 1, "an_difference_sign": 1, "an_yuen_ttest": 2,
    # r19 second wave: all three are calendar-bounded day-spine lag
    # windows (~2.5k rows at ANY corpus size); the >1 counts are the
    # ONE logical window's lineage repeated through the broadcast
    # scalar-attachment branches (base/Σu² cross joins), not extra
    # single-task funnels
    "an_dickey_fuller": 1, "an_variance_ratio": 5, "an_arch_lm": 5,
    # r19 third wave: an_g_test's global window runs over the
    # event-type × day-of-week cells frame (key-domain bounded, ≤ 35
    # rows at ANY corpus size — the window is HOW the corpus-sized
    # events table gets away with ONE scan); an_cointegration's lag is
    # the calendar-bounded day-spine DF regression (an_dickey_fuller's
    # frame applied to the residual series)
    "an_g_test": 1, "an_cointegration": 1,
    # r19 fourth wave: an_shapiro_francia's global sort rank runs over
    # the calendar-bounded day spine; an_fligner_killeen's offset
    # window runs over the k-row group frame (the an_quantiles_by_group
    # probe machinery)
    "an_shapiro_francia": 1, "an_fligner_killeen": 1,
}

GWIN = re.compile(r"gwin=\s*(\d+)")

# HARD rule #2, independent of the baseline (r15 verdict #4): a plan
# whose exchange count exceeds EXCH_BAR must carry an audited entry
# here. exch counts every "Exchange" token in the plan string; reuse is
# Plans.reusableExchanges — the canonicalized-DUPLICATE Exchange nodes
# AQE's stage cache executes once instead of re-deriving (the r15
# sim_recall_at_k finding: 27 string exchanges, 8 of them shares; the
# checkpoint variant measured +0.55 s, so staying on reuse is right).
# Each entry records the adjudicated ceiling (exch_max), the reuse
# floor (reuse_min — a drop means a formerly-shared subtree now
# re-derives), and the one-line justification. ExchAuditSpec parses
# THIS dict and re-checks both halves in-process against the live
# plans, so a stale entry fails CI, not just the dev loop.
EXCH_BAR = 10
EXCH_ALLOW = {
    # name: (exch_max, reuse_min, why) — reuse is the canonicalized-
    # duplicate Exchange count (Plans.reusableExchanges), the shares
    # AQE's stage cache executes once
    "an_basket": (13, 4, "pair co-occurrence over item-key-sized frames"),
    "an_basket_triples": (18, 9, "triple co-occurrence ladder over item-key-sized frames (r15: 1.35 s)"),
    "an_bh_fdr": (13, 5, "per-segment z ladder: k-sized segment frames + k-row step-up"),
    "an_by_fdr": (13, 5, "same ladder as an_bh_fdr with the BY penalty"),
    "an_cagr": (12, 5, "calendar-bounded yearly-sum frames"),
    "an_cramers_v": (12, 0, "contingency cells + marginals: key-domain-sized"),
    "an_cusum_sq": (11, 6, "calendar-bounded day-spine frames only: the squared prefix scan feeds the excursion frame, the max broadcast and the argmax re-filter; 6 canonical shares"),
    "an_cuminc": (12, 0, "distinct-event-time survival frames (day-spine cardinality): risk-set scan + the hasR semi-join + three curve windows, all spine-bounded"),
    "an_goldfeld_quandt": (11, 5, "calendar-bounded day-spine frames only: the segmented-moment frame feeds both segment selections + the n broadcast; 5 canonical shares"),
    "an_arch_lm": (11, 7, "calendar-bounded day-spine frames only: the increment frame feeds the m/S_r broadcast, the Sigma-u^2 broadcast, and the pair regression; 7 canonical shares"),
    "an_variance_ratio": (14, 9, "calendar-bounded day-spine frames only: one lag frame feeds the m/S_r broadcast and BOTH centered-square gathers (q=1 and q=5 branches); 9 canonical shares"),
    "an_dunn": (11, 0, "ten pairwise z's off the k-sized group frame, one corpus scan"),
    "an_entropy_rate": (12, 4, "state-transition matrix: key-domain-sized"),
    "an_fisher_exact": (28, 12, "five consumers of the ONE persisted ln-factorial scan (support slice + 3 lookup joins + margin constants); the string count includes the cached subtree's lineage repeated per InMemoryRelation reference, the scan itself runs once"),
    "an_james_stein": (11, 2, "k-sized group-moment frames + 1-row shrinkage broadcast, one corpus scan"),
    "an_kpss": (26, 2, "calendar-bounded day-spine frames only (~2.5k rows at any SF): the persisted ranked-deviation frame feeds the partial-sum scan and both lag-join sides; string count repeats the cached lineage"),
    "an_pettitt": (19, 10, "calendar-bounded day-spine frames only: the midrank value scan + time-order partial-sum scan + the argmax re-filter each re-reference the spine; 10 of the 19 are canonical shares"),
    "an_cochrane_orcutt": (14, 5, "calendar-bounded day-spine frames only: stage-1 fit, residual lag scan and quasi-differenced moments each re-reference the spine; 5 canonical shares"),
    "an_brown_forsythe": (12, 4, "priority-keyed value-grouped frames: the per-group median row-locators and the deviation pass re-reference the grouped scan; 4 canonical shares"),
    "an_weighted_kappa": (20, 9, "five consumers (cells/marginals/total/weighted sums) of the ONE persisted rank scan; downstream frames are 25-cell/5-row key-domain-sized; 9 canonical shares"),
    "an_cox_stuart": (11, 5, "day-spine index self-join: both pairing halves + the count broadcast re-reference the ranked spine; 5 canonical shares"),
    "an_friedman": (11, 0, "months x priorities rank frame, 12x5 at any SF"),
    "an_growth_accounting": (12, 0, "calendar-bounded month cohort frames"),
    "an_hhi": (12, 4, "per-segment share frames, k-sized"),
    "an_hll_distinct": (15, 3, "m-register sketch frames (model-sized), one corpus scan (r15: 1.0 s)"),
    "an_hll_set_est": (14, 4, "two m-register sketches + set algebra, model-sized"),
    "an_hurst": (13, 10, "3 window scales over the calendar-bounded day spine"),
    "an_mad_outliers": (12, 3, "two-level PrefixSum median/MAD frames, group-key-sized"),
    "an_mase": (12, 4, "7 horizons over the calendar-bounded holdout spine"),
    "dedup_containment": (15, 8, "prefix-blocking candidate ladder; shuffles carry 8-byte hashes (r15: 1.4 s)"),
    "dedup_source_matrix": (13, 5, "per-source-pair rollups of the one banded candidate base"),
    "dedup_threshold_sweep": (11, 4, "threshold sweep over the one banded candidate base"),
    "sim_ivf_ann": (16, 4, "Lloyd rounds: k-sized centroid frames, one corpus scan per round"),
    "sim_ivf_kmeans": (16, 4, "shares sim_ivf_ann's Lloyd shape"),
    "an_fligner_killeen": (16, 2, "two rank ladders (per-group median scan, pooled |dev| scan) + the k-sized median/score broadcasts; every frame distinct-value- or key-domain-sized, the corpus is scanned twice (median pass + deviation pass) by construction"),
    "sim_recall_at_k": (30, 8, "union branches share the brute-force/LSH executions (AQE canonical reuse; checkpoint variant +0.55 s, r15); +3 in r19 from the corpus scan-spread repartition repeated per branch, same canonical-reuse class"),
}

EXCH = re.compile(r"exch=\s*(\d+)")
REUSE = re.compile(r"reuse=\s*(\d+)")


def exch_violations(fresh):
    bad = []
    for n, metrics in sorted(fresh.items()):
        em, rm = EXCH.search(metrics), REUSE.search(metrics)
        if em is None or rm is None:
            bad.append((n, "plan line has no exch=/reuse= field — stale "
                           "Plans binary or output-format drift"))
            continue
        exch, reuse = int(em.group(1)), int(rm.group(1))
        if n in EXCH_ALLOW:
            mx, rmin, why = EXCH_ALLOW[n]
            if exch > mx:
                bad.append((n, f"exch={exch} > allowlisted {mx} ({why})"))
            elif reuse < rmin:
                bad.append((n, f"reuse={reuse} dropped below allowlisted "
                               f"{rmin} — the shared-exchange adjudication "
                               f"no longer holds ({why})"))
        elif exch > EXCH_BAR:
            bad.append((n, f"exch={exch} > bar {EXCH_BAR} with no "
                           f"EXCH_ALLOW entry — adjudicate the plan "
                           f"(ReusedExchange shares / key-domain-bounded "
                           f"frames vs real re-derivation) and allowlist "
                           f"it with a one-line justification"))
    return bad


def gwin_violations(fresh):
    bad = []
    for n, metrics in sorted(fresh.items()):
        m = GWIN.search(metrics)
        if m is None:
            # a plan line WITHOUT a gwin field means a stale Plans binary
            # or output drift — the hard rule would silently not apply,
            # so treat the absence itself as a violation (round-13
            # advice: a pre-gwin dump must not re-baseline past the rule)
            bad.append((n, None, GWIN_ALLOW.get(n, 0)))
        elif int(m.group(1)) > GWIN_ALLOW.get(n, 0):
            bad.append((n, int(m.group(1)), GWIN_ALLOW.get(n, 0)))
    return bad


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
    # the hard rules run FIRST and also on --update: neither a funnel
    # nor an unadjudicated high-exchange plan can be recorded into the
    # baseline
    bad = gwin_violations(fresh)
    for n, got, allowed in bad:
        if got is None:
            print(f"FAIL plan-gate {n}: plan line has NO gwin= field — "
                  f"stale Plans binary or output-format drift; the hard "
                  f"funnel rule cannot be evaluated, refusing to proceed")
        else:
            print(f"FAIL plan-gate {n}: gwin={got} > allowed {allowed} — "
                  f"unpartitioned Window over a non-limit-bounded frame "
                  f"(single-task funnel); use limit-first TakeOrdered or an "
                  f"aggregate argmax, or audit the frame and allowlist it")
    exch_bad = exch_violations(fresh)
    for n, msg in exch_bad:
        print(f"FAIL plan-gate {n}: {msg}")
    if bad or exch_bad:
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
