#!/usr/bin/env python3
"""Round-over-round bench attribution.

Usage: python3 tools/benchdiff.py <old_bench.json> <new_bench.json> [ratio]

Compares two Bench artifacts that carry per-query `plan_fp` fingerprints
(BENCH_FULL.json from round 10 on) and splits every timing change beyond
the flag threshold into plan-changed vs same-plan rows. The threshold is
the LARGER of the explicit [ratio] argument (default 1.4x) and each side's
measured `noise_floor` (round 12: the max/min spread of fixed sentinel
queries re-timed at sweep start/middle/end) — a same-plan delta inside the
noise the sweep itself measured is not worth a row. Rows split into:

  PLAN      - the fingerprint changed: a real plan regression or fix;
              read the two plans (SPARK_GRAFT_FP_DUMP=<dir> dumps the
              normalized text) before accepting it.
  ENV/DATA  - same fingerprint: the plan is identical, so the delta is
              fixture drift (the driver regenerates /root/testdata between
              rounds) or host noise; re-measure isolated
              (SPARK_GRAFT_ONLY=<q>) before chasing it.

Queries present on one side only are listed as ADDED/REMOVED. Fingerprints
from before the round-10 stabilization (plan_id/path/statistics masking)
are not comparable across sessions; a diff against such an artifact
over-reports PLAN rows.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", {})
    # full artifacts store {name: sec}; the printed tail line stores the same
    secs = {k: (v["sec"] if isinstance(v, dict) else v) for k, v in qs.items()}
    return secs, d.get("plan_fp", {}), d.get("noise_floor")


def main(old_path, new_path, ratio):
    old, ofp, onf = load(old_path)
    new, nfp, nnf = load(new_path)
    floors = [f for f in (onf, nnf) if f and f > 0]
    measured = max(floors) if floors else None
    if measured and measured > ratio:
        print(
            f"flag threshold raised {ratio:.2f}x -> {measured:.2f}x "
            f"(measured sentinel noise floor; old={onf}, new={nnf})"
        )
        ratio = measured
    elif measured:
        print(f"measured noise floor {measured:.2f}x under {ratio:.2f}x flag; keeping {ratio:.2f}x")
    both = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    rows = []
    for q in both:
        a, b = old[q], new[q]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r >= ratio or r <= 1.0 / ratio:
            fp_known = q in ofp and q in nfp
            kind = (
                "PLAN"
                if fp_known and ofp[q] != nfp[q]
                else ("ENV/DATA" if fp_known else "NO-FP")
            )
            rows.append((r, q, a, b, kind))

    rows.sort(reverse=True)
    if not rows:
        print(f"no per-query change beyond {ratio:.2f}x across {len(both)} shared queries")
    for r, q, a, b, kind in rows:
        arrow = "regressed" if r > 1 else "improved"
        print(f"{kind:8s} {q:28s} {a:7.2f}s -> {b:7.2f}s  ({r:5.2f}x {arrow})")

    tot_old = sum(old[q] for q in both)
    tot_new = sum(new[q] for q in both)
    # disjoint artifacts (e.g. two BENCH_PARTIAL.json from different
    # SPARK_GRAFT_ONLY subsets) share nothing: still print the added/
    # removed summary instead of dividing by zero
    ratio_txt = f"({tot_new / tot_old:.2f}x)" if tot_old > 0 else "(no shared queries)"
    print(f"\nshared {len(both)} queries: {tot_old:.1f}s -> {tot_new:.1f}s {ratio_txt}")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    n_plan = sum(1 for x in rows if x[4] == "PLAN")
    n_env = sum(1 for x in rows if x[4] == "ENV/DATA")
    print(f"attribution: {n_plan} plan-changed, {n_env} same-plan (fixture/noise)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
    sys.exit(main(sys.argv[1], sys.argv[2], thr))
