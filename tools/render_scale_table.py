#!/usr/bin/env python3
"""Render the slope table from committed BENCHFULL artifacts, and CHECK
the per-decade slope budget.

Usage:
  python3 tools/render_scale_table.py BENCHFULL.json BENCHFULL_sf1.json BENCHFULL_sf10.json [BENCHFULL_sf30.json] [--budget X] [--sf10twins BENCHFULL_sf10twins.json]

Prints a markdown table (per-slot seconds at each SF + per-decade ratios,
sorted by sf10 cost desc) and summary stats, so SCALE.md's scaling
evidence regenerates mechanically from the committed sweep artifacts
instead of being re-typed from RunOne prose (round-10 VERDICT task 3).

Round-12 additions (VERDICT r11 tasks 2 and 7, ADVICE r11):
  - failed slots (sentinel time -1.0 / listed in an artifact's `errors`)
    are EXCLUDED from the table and all stats and rendered in a separate
    FAILED section — a -1 sentinel must never become a "-0.1x slope" row;
  - --budget X (default 12) turns the slope table into a checked
    contract: exit 1 if any slot's sf1->sf10 slope exceeds X. Slots that
    are super-linear by construction must be pinned to the oracle SF
    (SparkEntry.exactDialPinnedToOracleSf) — then they simply don't
    appear above sf0.1 — or output-bounded and re-dialed. The q51/q55
    class gets caught mechanically at commit time, not by the judge.

Round-14 addition (VERDICT r13 task 1 adjudication): --sf10twins takes a
twins-only sf10 artifact swept under the SAME 15-slot filtered protocol
as the sf30 probe and uses it as the third-decade slope's DENOMINATOR.
The full-sweep sf10 artifact measures each slot after ~45 minutes of
196-slot JIT/cache warmth; the filtered sf30 probe after ~3 minutes —
that asymmetry inflated mid-length slots' apparent sf10→sf30 slopes by
~30% (q172_mmr_prod: 15.5 s in the marathon, ~21 s fresh — same code,
same data; stage-level profiling showed candidate volume EXACTLY linear,
737 pairs/query at both SFs). Decades must compare like-for-like
protocols. Without --sf10twins the full-sf10 artifact remains the
denominator, as in round 13.

Round-13 additions (VERDICT r12 task 5, ADVICE r12):
  - an optional FOURTH artifact (a twins-only sf30 sweep) adds a
    "sf10→sf30 @3x" column and a third-decade budget check: sf30 covers
    3x the sf10 data, so its per-slot cap is budget*(3/10) (linear at 3x
    data = 3x; the 12x/decade budget prorates to 3.6x at 3x), with
    DOCUMENTED_STEPS multipliers honored the same way;
  - a slot whose sf1 time is <= 0 is reported as failed-for-slope and
    EXCLUDED (a NaN slope must never silently pass the budget or poison
    the median);
  - the DOCUMENTED STEPS section prints the actual comparison
    ("{s}x vs cap {cap}x") instead of asserting "<= cap" unconditionally.
"""
import json
import statistics
import sys

# Slots whose sf1→sf10 ratio is a DOCUMENTED bounded cost STEP, not a
# compounding slope — exempt from the default budget but still checked
# against their own declared cap, so the exemption stays a contract.
# A step multiplies total cost ONCE by a bounded factor; a slope
# compounds every decade. Each entry: slot -> (cap_multiplier, reason).
#
#   q162: Misra–Gries coverage is data-dependent (SCALE.md round 11 —
#   the k-th bigram count grew ~6x while the stream grew 10x across the
#   decade, so capacity 16384, comfortably provable at sf1, fails the
#   proof at sf10). The slot opts into autoGrow: one 4x-capacity retry
#   = two extra corpus scans. Retries are hard-capped (4096 -> 2^20 is
#   <= 4 doublings-of-doublings), so total cost <= (1 + retries) x
#   linear — asymptotically O(N) with a bounded constant. The measured
#   ratio conflates that one-time constant with growth; cap it at
#   budget x 2.5 (the heal's worst-case cost factor at this decade).
#   The sf30 probe measured the heal does NOT re-trigger (2.5x at 3x),
#   so the third-decade check uses the PLAIN prorated budget — a
#   one-time cost-step exemption must not compound into later decades.
DOCUMENTED_STEPS = {
    "q162_ngram_hitters": (2.5, "MG autoGrow heal: +2 corpus scans once, "
                                "retry count hard-capped => O(N) overall"),
}


def load(path):
    with open(path) as f:
        return json.load(f)


def ok_slots(bench):
    """Slot -> seconds for slots that genuinely ran (not failed)."""
    errs = set(bench.get("errors", {}))
    return {k: v for k, v in bench["queries"].items() if v >= 0 and k not in errs}


def main(argv):
    budget = 12.0
    if "--budget" in argv:
        i = argv.index("--budget")
        budget = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    p10t = None
    if "--sf10twins" in argv:
        i = argv.index("--sf10twins")
        p10t = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    p01, p1, p10 = argv[:3]
    p30 = argv[3] if len(argv) > 3 else None
    b01, b1, b10 = load(p01), load(p1), load(p10)
    q01, q1, q10 = ok_slots(b01), ok_slots(b1), ok_slots(b10)
    b30 = load(p30) if p30 else None
    q30 = ok_slots(b30) if b30 else {}
    # third-decade denominator: the like-for-like twins-only sf10 sweep
    # when provided, the full-sweep sf10 otherwise (see module docstring)
    b10t = load(p10t) if p10t else None
    q10den = ok_slots(b10t) if p10t else q10
    den_label = "sf10twins" if p10t else "sf10"

    failed = []
    for name, b in [("sf0.1", b01), ("sf1", b1), ("sf10", b10)] + \
                   ([("sf10twins", b10t)] if b10t else []) + \
                   ([("sf30", b30)] if b30 else []):
        for slot, err in sorted(b.get("errors", {}).items()):
            failed.append((name, slot, err))
    # A slot that ran at sf30 but is absent/non-positive in the
    # third-decade DENOMINATOR has an undefined slope — that must be a
    # hard error, not a silently-rendered '— | —' row that passes the
    # budget check unexamined (ADVICE r14).
    den_missing = sorted(n for n in q30 if q10den.get(n, 0) <= 0)
    for n in den_missing:
        failed.append((den_label, n,
                       "absent/non-positive in the third-decade denominator "
                       "-> sf30 slope undefined (re-sweep the denominator)"))

    common = sorted(set(q1) & set(q10), key=lambda n: -q10[n])
    # a zero/negative sf1 time makes the slope undefined — treat as a
    # failed slot (excluded + reported), never a NaN that passes checks
    for n in [n for n in common if q1[n] <= 0]:
        failed.append(("sf1", n, f"non-positive time {q1[n]} -> slope undefined"))
        common.remove(n)
    hdr30 = f" sf30 s | {den_label}→sf30 @3x |" if b30 else ""
    print(f"| query | sf0.1 s | sf1 s | sf10 s | sf1→sf10 |{hdr30} reading |")
    print("|---|---|---|---|---|" + ("---|---|" if b30 else "") + "---|")
    slopes = {}
    slopes30 = {}
    for n in common:
        s01 = q01.get(n)
        s1, s10 = q1[n], q10[n]
        slope = s10 / s1
        slopes[n] = slope
        c01 = f"{s01:.2f}" if s01 is not None else "—"
        c30 = ""
        if b30:
            den = q10den.get(n, 0)
            if n in q30 and den > 0:
                slopes30[n] = q30[n] / den
                c30 = f" {q30[n]:.2f} | {slopes30[n]:.1f}× |"
            else:
                c30 = " — | — |"
        print(f"| {n} | {c01} | {s1:.2f} | {s10:.2f} | {slope:.1f}× |{c30} |")
    med = statistics.median(slopes.values())
    if len(slopes) >= 2:
        p25 = statistics.quantiles(list(slopes.values()), n=4)[0]
        p75 = statistics.quantiles(list(slopes.values()), n=4)[2]
        spread = f"(p25 {p25:.2f} / p75 {p75:.2f})"
    else:
        spread = "(too few slots for quartiles)"
    tail = [n for n, s in slopes.items() if s >= 8]
    print(f"\ncommon slots {len(common)}; median sf1→sf10 slope {med:.2f}x "
          f"{spread}; >=8x tail: {sorted(tail)}")
    print(f"pinned_skipped sf10: {sorted(b10.get('pinned_skipped', []))}")
    totals = (f"totals: sf0.1 {b01['value']}s/{len(q01)} slots, "
              f"sf1 {b1['value']}s/{len(q1)} slots, sf10 {b10['value']}s/{len(q10)} slots")
    if b30:
        totals += f", sf30 {b30['value']}s/{len(q30)} slots"
        if slopes30:
            print(f"{den_label}→sf30 (3x data, linear = 3.0x): "
                  f"{len(slopes30)} slots, median {statistics.median(slopes30.values()):.2f}x")
    print(totals)

    if failed:
        print("\nFAILED (excluded from table and stats):")
        for name, slot, err in failed:
            print(f"  {name} {slot}: {err}")

    # ---- the checked contract: no unpinned slot may exceed the budget ----
    # Documented cost-steps get their own (tighter-reasoned) cap instead of
    # the default budget; everything else must fit the budget outright.
    # The third decade (sf30 = 3x the sf10 data) prorates the per-decade
    # budget to 3x data: cap = budget * 3/10.
    def cap_of(n, base):
        step = DOCUMENTED_STEPS.get(n)
        return base * step[0] if step else base

    steps = sorted((n, s) for n, s in slopes.items()
                   if n in DOCUMENTED_STEPS and s > budget)
    if steps:
        print("\nDOCUMENTED STEPS (exempt from the default budget, checked "
              "against their own cap):")
        for n, s in steps:
            cap, reason = DOCUMENTED_STEPS[n]
            verdict = "within" if s <= budget * cap else "EXCEEDS"
            print(f"  {n}: {s:.1f}x {verdict} cap {budget * cap:g}x — {reason}")

    over = sorted((n, s, cap_of(n, budget), "sf1→sf10")
                  for n, s in slopes.items() if s > cap_of(n, budget))
    # Third decade: the PLAIN prorated budget, never a DOCUMENTED_STEPS
    # multiplier (ADVICE r13) — a cost-step exemption is a one-time
    # constant; letting it compound into the next decade would silently
    # turn a 3.6x cap into 9x for q162 even though the step does not
    # re-trigger (measured 2.5x at sf10→sf30).
    budget30 = budget * 3.0 / 10.0
    over += sorted((n, s, budget30, f"{den_label}→sf30")
                   for n, s in slopes30.items() if s > budget30)
    if over:
        print(f"\nSLOPE BUDGET VIOLATION (budget {budget:g}x/decade, "
              f"{budget30:g}x at 3x data):", file=sys.stderr)
        for n, s, cap, decade in over:
            print(f"  {n}: {s:.1f}x {decade} (cap {cap:g}x) — pin it to the "
                  "oracle SF (exactDialPinnedToOracleSf) or re-dial it linear",
                  file=sys.stderr)
        return 1
    if den_missing:
        print(f"\nTHIRD-DECADE DENOMINATOR INCOMPLETE: {den_missing} ran at "
              f"sf30 but have no usable {den_label} time — their slopes were "
              "NOT checked. Re-sweep the denominator artifact.", file=sys.stderr)
        return 1
    if failed:
        print(f"\nNOTE: {len(failed)} failed slot(s) above — slope budget "
              "passes only over slots that ran.", file=sys.stderr)
    checked30 = f" + {len(slopes30)} third-decade slots" if slopes30 else ""
    print(f"\nslope budget OK: all {len(slopes)} common slots{checked30} within "
          f"budget ({budget:g}x/decade; documented steps at their declared caps)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
