#!/usr/bin/env python3
"""Diff the full-suite sf1 sweep against the sf0.1 table: per-query ratio,
sorted descending, with totals — the judge-facing scale evidence."""
import json, sys

sf01 = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCHFULL.json"))
sf1 = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCHFULL_sf1.json"))

rows = []
for q, t1 in sf1["queries"].items():
    t0 = sf01["queries"].get(q)
    if t0 is None or t0 <= 0 or t1 <= 0:
        rows.append((float("inf") if t1 > 0 else -1, q, t0, t1))
    else:
        rows.append((t1 / t0, q, t0, t1))
rows.sort(reverse=True)
print(f"{'ratio':>7}  {'sf0.1':>8}  {'sf1':>8}  query")
for r, q, t0, t1 in rows:
    r_s = f"{r:.1f}x" if r not in (-1, float("inf")) else ("new" if r == float("inf") else "ERR")
    t0_s = f"{t0:.2f}" if t0 else "-"
    print(f"{r_s:>7}  {t0_s:>8}  {t1:>8.2f}  {q}")
print(f"\ntotals: sf0.1 {sf01['value']:.1f}s ({len(sf01['queries'])} q, "
      f"{sf01['failed']} failed)  sf1 {sf1['value']:.1f}s "
      f"({len(sf1['queries'])} q, {sf1['failed']} failed)")
ok = [r for r, *_ in rows if r not in (-1, float("inf"))]
if ok:
    ok.sort()
    print(f"median ratio {ok[len(ok)//2]:.2f}x, >10x count {sum(1 for r in ok if r > 10)}")
