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


def main():
    a1, w1 = load("antijoin", "sf1"), load("window", "sf1")
    a10, w10 = load("antijoin", "sf10"), load("window", "sf10")
    print("| slot | family | sf1 window | sf1 anti | sf10 window | sf10 anti | sf10 anti/window |")
    print("|---|---|---|---|---|---|---|")
    for slot, fam in FAMS.items():
        r = a10[slot] / w10[slot] if w10.get(slot, 0) > 0 else float("nan")
        print(f"| {slot} | {fam} | {w1[slot]:.2f} | {a1[slot]:.2f} "
              f"| {w10[slot]:.2f} | {a10[slot]:.2f} | {r:.2f}× |")
    tw, ta = sum(w10.values()), sum(a10.values())
    print(f"\nsf10 totals: window {tw:.1f}s, antijoin {ta:.1f}s "
          f"(anti/window {ta / tw:.2f}x)")


if __name__ == "__main__":
    main()
