#!/usr/bin/env python3
"""Render the two-decade slope table from committed BENCHFULL artifacts.

Usage: python3 tools/render_scale_table.py BENCHFULL.json BENCHFULL_sf1.json BENCHFULL_sf10.json

Prints a markdown table (per-slot seconds at each SF + per-decade ratios,
sorted by sf10 cost desc) and summary stats, so SCALE.md's two-decade
evidence regenerates mechanically from the committed sweep artifacts
instead of being re-typed from RunOne prose (round-10 VERDICT task 3).
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main(p01, p1, p10):
    b01, b1, b10 = load(p01), load(p1), load(p10)
    q01, q1, q10 = b01["queries"], b1["queries"], b10["queries"]
    for name, b in (("sf0.1", b01), ("sf1", b1), ("sf10", b10)):
        errs = {k: v for k, v in b.get("errors", {}).items()}
        if errs:
            print(f"WARNING {name}: errors {errs}", file=sys.stderr)
    common = sorted(set(q1) & set(q10), key=lambda n: -q10[n])
    print("| query | sf0.1 s | sf1 s | sf10 s | sf1→sf10 | reading |")
    print("|---|---|---|---|---|---|")
    slopes = {}
    for n in common:
        s01 = q01.get(n)
        s1, s10 = q1[n], q10[n]
        slope = s10 / s1 if s1 > 0 else float("nan")
        slopes[n] = slope
        c01 = f"{s01:.2f}" if s01 is not None else "—"
        print(f"| {n} | {c01} | {s1:.2f} | {s10:.2f} | {slope:.1f}× | |")
    med = statistics.median(slopes.values())
    p25 = statistics.quantiles(list(slopes.values()), n=4)[0]
    p75 = statistics.quantiles(list(slopes.values()), n=4)[2]
    tail = [n for n, s in slopes.items() if s >= 8]
    print(f"\ncommon slots {len(common)}; median sf1→sf10 slope {med:.2f}x "
          f"(p25 {p25:.2f} / p75 {p75:.2f}); >=8x tail: {sorted(tail)}")
    print(f"pinned_skipped sf10: {sorted(b10.get('pinned_skipped', []))}")
    print(f"totals: sf0.1 {b01['value']}s/{len(q01)} slots, "
          f"sf1 {b1['value']}s/{len(q1)} slots, sf10 {b10['value']}s/{len(q10)} slots")


if __name__ == "__main__":
    main(*sys.argv[1:4])
