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
              normalized text) before accepting it. PLAN rows are listed
              regardless of the timing ratio — a fingerprint change is
              deterministic evidence the plan moved, and the noise floor
              argues only about timing deltas, not plan identity.
  DATA      - same fingerprint, the two artifacts' `fixture` stamps
              (per-table row counts + bytes, round 14) differ, AND the query
              reads a changed table (round 15, from the `plan_tables` map —
              a query whose inputs are disjoint from the changed tables
              cannot be explained by fixture drift and is labelled HOST
              instead): the delta is fixture drift, deterministically
              attributed, no isolated re-measure needed. Queries with
              unknown inputs keep the conservative DATA label.
  HOST      - same fingerprint AND (identical fixture stamps, or the
              query's inputs are disjoint from every changed table): the
              delta can only be host noise; re-measure isolated
              (SPARK_GRAFT_ONLY=<q>) before chasing it.
  ENV/DATA  - same fingerprint but at least one side predates the fixture
              stamp: fixture drift and host noise cannot be separated.
              The raised (measured-noise-floor) threshold applies to all
              three same-plan kinds.

The `artifacts` maps (offline build walls: pipeline_stages, dedup cache
builds, …) are diffed with the same ratio logic so a regression moved out
of a memoized query wall still gets flagged.

Queries present on one side only are listed as ADDED/REMOVED. Fingerprints
from before the round-10 stabilization (plan_id/path/statistics masking)
are not comparable across sessions; a diff against such an artifact
over-reports PLAN rows. Round 13 added partition-count masking
(Repartition/RepartitionByExpression literals), so queries with explicit
numbered repartitions fingerprint differently across that boundary too.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", {})
    # full artifacts store {name: sec}; the printed tail line stores the same
    secs = {k: (v["sec"] if isinstance(v, dict) else v) for k, v in qs.items()}
    arts = {k: v for k, v in d.get("artifacts", {}).items() if isinstance(v, (int, float))}
    return (secs, d.get("plan_fp", {}), d.get("noise_floor"), arts, d.get("fixture"),
            d.get("plan_tables", {}))


def main(old_path, new_path, ratio):
    old, ofp, onf, oart, ofix, otab = load(old_path)
    new, nfp, nnf, nart, nfix, ntab = load(new_path)
    # same-plan attribution label: DATA when the fixture stamps prove the
    # testdata changed, HOST when they prove it did not, ENV/DATA when a
    # side predates the stamp and the two cannot be separated
    changed_tables = set()
    if ofix is not None and nfix is not None:
        sameplan_kind = "HOST" if ofix == nfix else "DATA"
        if sameplan_kind == "DATA":
            changed_tables = {
                t for t in set(ofix) | set(nfix) if ofix.get(t) != nfix.get(t)
            }
            print(f"fixture changed: {', '.join(sorted(changed_tables))} "
                  f"(same-plan deltas on queries READING those tables attributed DATA)")
        else:
            print("fixture identical on both sides (same-plan deltas are HOST noise)")
    else:
        sameplan_kind = "ENV/DATA"

    def kind_for(q):
        """Per-query same-plan label: a fixture change only explains a delta
        on a query that actually READS a changed table (round 15 — a global
        DATA label mis-attributed genuine host noise on unrelated queries to
        fixture drift). Unknown inputs (pre-round-15 artifact, or an eager
        driver-loop query whose final plan reads a checkpoint) keep the
        conservative global label."""
        if sameplan_kind != "DATA":
            return sameplan_kind
        tq = ntab.get(q) if ntab.get(q) else otab.get(q)
        if not tq:
            return "DATA"
        return "DATA" if set(tq) & changed_tables else "HOST"
    floors = [f for f in (onf, nnf) if f and f > 0]
    measured = max(floors) if floors else None
    # The measured floor raises the bar for SAMEPLAN timing rows only: a
    # fingerprint change is deterministic plan evidence regardless of how
    # noisy the timings are, so PLAN rows keep the base ratio (and are
    # listed even with no timing change at all).
    sameplan_ratio = ratio
    if measured and measured > ratio:
        print(
            f"same-plan flag threshold raised {ratio:.2f}x -> {measured:.2f}x "
            f"(measured sentinel noise floor; old={onf}, new={nnf}); "
            f"PLAN rows always listed"
        )
        sameplan_ratio = measured
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
        fp_known = q in ofp and q in nfp
        plan_changed = fp_known and ofp[q] != nfp[q]
        if plan_changed:
            rows.append((r, q, a, b, "PLAN"))
        elif r >= sameplan_ratio or r <= 1.0 / sameplan_ratio:
            rows.append((r, q, a, b, kind_for(q) if fp_known else "NO-FP"))

    rows.sort(reverse=True)
    if not rows:
        print(f"no plan change and no same-plan delta beyond {sameplan_ratio:.2f}x across {len(both)} shared queries")
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
    n_data = sum(1 for x in rows if x[4] in ("ENV/DATA", "DATA"))
    n_host = sum(1 for x in rows if x[4] == "HOST")
    print(f"attribution: {n_plan} plan-changed, {n_data} data, {n_host} host-noise "
          f"(global fixture verdict: {sameplan_kind})")

    # Offline artifact walls (memoized/staged builds) move real work out of
    # query timings; diff them too so a staged regression cannot hide.
    art_rows = []
    for k in sorted(set(oart) & set(nart)):
        a, b = oart[k], nart[k]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r >= sameplan_ratio or r <= 1.0 / sameplan_ratio:
            art_rows.append((r, k, a, b))
    art_added = sorted(set(nart) - set(oart))
    art_removed = sorted(set(oart) - set(nart))
    if art_rows or art_added or art_removed:
        print("\nartifact (offline-build) walls:")
        for r, k, a, b in sorted(art_rows, reverse=True):
            arrow = "regressed" if r > 1 else "improved"
            print(f"ARTIFACT {k:28s} {a:7.2f}s -> {b:7.2f}s  ({r:5.2f}x {arrow})")
        if art_added:
            print(f"artifacts added ({len(art_added)}): {', '.join(art_added)}")
        if art_removed:
            print(f"artifacts removed ({len(art_removed)}): {', '.join(art_removed)}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
    sys.exit(main(sys.argv[1], sys.argv[2], thr))
