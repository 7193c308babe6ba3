#!/usr/bin/env python3
"""Warmth-protocol acceptance check (round 15 — VERDICT r14 task 3).

Compares every slot present in BOTH the marathon sf10 artifact and the
filtered sf10twins artifact. With the per-slot warm-up in place the two
protocols must measure the same warm steady state, so each slot's
filtered/marathon ratio should sit near 1.0; the named acceptance is the
three formerly warmth-sensitive slots (q172_mmr_prod, q183_sq8_ivf_prod,
q192_bitext_bidi_prod) within +-5%.

Exit policy (round 16 — ADVICE r15): a tolerance miss on a named slot
prints a WARMTH WARNING and exits 0. The +-5% acceptance has NOT been
claimed met (round-15 readings sit at ~+10%, inside the documented ~10%
single-run host variance), and an acceptance gate that is red at HEAD
either blocks automation or trains people to ignore it. Exit 1 is
reserved for a BROKEN comparison: a named slot missing from either
artifact. Re-tighten to a hard failure only when the acceptance is
actually claimed.

Usage:
  python3 tools/check_warmth.py BENCHFULL_sf10.json BENCHFULL_sf10twins.json [--tol 0.05]
"""
import json
import sys

NAMED = ["q172_mmr_prod", "q183_sq8_ivf_prod", "q192_bitext_bidi_prod"]


def load(path):
    with open(path) as f:
        b = json.load(f)
    errs = set(b.get("errors", {}))
    return {k: v for k, v in b["queries"].items() if v >= 0 and k not in errs}


def main(argv):
    tol = 0.05
    if "--tol" in argv:
        i = argv.index("--tol")
        tol = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    marathon, filtered = load(argv[0]), load(argv[1])
    common = sorted(set(marathon) & set(filtered))
    print(f"| slot | marathon s | filtered s | filtered/marathon |")
    print(f"|---|---|---|---|")
    bad = []
    for n in common:
        r = filtered[n] / marathon[n] if marathon[n] > 0 else float("inf")
        mark = " <-- NAMED" if n in NAMED else ""
        print(f"| {n} | {marathon[n]:.2f} | {filtered[n]:.2f} | {r:.3f} |{mark}")
        if n in NAMED and abs(r - 1.0) > tol:
            bad.append((n, r))
    missing = [n for n in NAMED if n not in common]
    if missing:
        print(f"\nNAMED slots missing from an artifact: {missing}", file=sys.stderr)
        return 1
    if bad:
        print(f"\nWARMTH WARNING (tol +-{tol:.0%}; warn-only while the "
              "acceptance is unclaimed — see docstring):", file=sys.stderr)
        for n, r in bad:
            print(f"  {n}: filtered/marathon {r:.3f}", file=sys.stderr)
        return 0
    print(f"\nwarmth check OK: all {len(NAMED)} named slots within +-{tol:.0%} "
          "(marathon and filtered protocols measure the same steady state)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
