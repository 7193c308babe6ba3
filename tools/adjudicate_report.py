#!/usr/bin/env python3
"""Render the round-13 cap-implementation adjudication table from the
scratch/adjudicate/{antijoin,window}_{sf1,sf10}.json sweeps produced by
tools/adjudicate_cap.sh (both impls measured on ONE HEAD via the
GRAFT_CAP_IMPL dial)."""
import json

FAMS = {
    "q12_neardup_minhash_prod": "LSH bands (word shingle)",
    "q40_neardup_ngram_prod":   "LSH bands (char ngram)",
    "q142_split_leakage_prod":  "LSH bands (split leakage)",
    "q85_substring_dup":        "winnow fingerprints",
    "q92_substring_dup_prod":   "winnow fingerprints (prod)",
    "q13_neardup_simhash":      "hash64 chunks (simhash)",
    "q90_image_neardup":        "hash64 chunks (perceptual)",
    "q14_neardup_embedding":    "SRP tables",
    "q168_semdedup_prod":       "SemDeDup cells",
}


def load(impl, sf):
    with open(f"scratch/adjudicate/{impl}_{sf}.json") as f:
        return json.load(f)["queries"]


def cell(qs, slot):
    """A failed slot is encoded as -1.0 in the queries map — render it as
    a visible FAILED marker, never as negative seconds in a cell (and keep
    it out of the totals below, mirroring render_scale_table's ok_slots)."""
    v = qs.get(slot)
    return f"{v:.2f}" if v is not None and v > 0 else "FAILED"


def main():
    a1, w1 = load("antijoin", "sf1"), load("window", "sf1")
    a10, w10 = load("antijoin", "sf10"), load("window", "sf10")
    print("| slot | family | sf1 window | sf1 anti | sf10 window | sf10 anti | sf10 anti/window |")
    print("|---|---|---|---|---|---|---|")
    for slot, fam in FAMS.items():
        ok = a10.get(slot, 0) > 0 and w10.get(slot, 0) > 0
        r = f"{a10[slot] / w10[slot]:.2f}×" if ok else "FAILED"
        print(f"| {slot} | {fam} | {cell(w1, slot)} | {cell(a1, slot)} "
              f"| {cell(w10, slot)} | {cell(a10, slot)} | {r} |")
    # totals over slots that genuinely ran in BOTH impls — a -1.0 failure
    # sentinel must never silently subtract from the verdict's totals
    both = [s for s in FAMS if a10.get(s, 0) > 0 and w10.get(s, 0) > 0]
    dropped = sorted(set(FAMS) - set(both))
    tw, ta = sum(w10[s] for s in both), sum(a10[s] for s in both)
    print(f"\nsf10 totals over {len(both)} slots that ran in both impls: "
          f"window {tw:.1f}s, antijoin {ta:.1f}s (anti/window {ta / tw:.2f}x)")
    if dropped:
        print(f"EXCLUDED from totals (failed/missing in at least one impl): {dropped}")


if __name__ == "__main__":
    main()
