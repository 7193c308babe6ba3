#!/bin/bash
# Round-13 adjudication (VERDICT r12 task 1): measure the oversized-bucket
# cut both ways — GRAFT_CAP_IMPL=window (pre-round-12 count-over-window)
# vs antijoin (round-12 aggregate + left-anti) — on ONE HEAD, at sf1 and
# sf10, over the nine slots that exercise all six blocking families:
#   LSH bands     q12_neardup_minhash_prod, q40_neardup_ngram_prod,
#                 q142_split_leakage_prod
#   winnow        q85_substring_dup, q92_substring_dup_prod
#   hash64 chunks q13_neardup_simhash, q90_image_neardup
#   SRP tables    q14_neardup_embedding
#   SemDeDup cell q168_semdedup_prod
# Emits scratch/adjudicate/<impl>_<sf>.json (copy the results to bench_evidence/ when committing) (Bench min-of-2, warm JVM).
set -e
cd /root/repo
export SPARK_GRAFT_QUERY_BUDGET_SEC=1500
export SPARK_GRAFT_SLOT_FILTER='^(q12_neardup_minhash_prod|q40_neardup_ngram_prod|q142_split_leakage_prod|q85_substring_dup|q92_substring_dup_prod|q13_neardup_simhash|q90_image_neardup|q14_neardup_embedding|q168_semdedup_prod)$'
mkdir -p scratch/adjudicate
for impl in antijoin window; do
  for sf in sf1 sf10; do
    echo "=== $impl @ $sf ==="
    GRAFT_CAP_IMPL=$impl \
    SPARK_GRAFT_SF_DIR=/root/repo/scratch/$sf \
    SPARK_GRAFT_BENCHFULL_OUT=/root/repo/scratch/adjudicate/${impl}_${sf}.json \
      sbt -batch "runMain graft.Bench" > /tmp/adjudicate_${impl}_${sf}.log 2>&1
    tail -1 /tmp/adjudicate_${impl}_${sf}.log
  done
done
echo "=== adjudication sweeps done ==="
