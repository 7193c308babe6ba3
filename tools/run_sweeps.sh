#!/bin/bash
# Full three-SF sweep protocol (SCALE.md rounds 8/11): per-query budget
# 1500 s, min-of-2 passes, multi-minute slots measured once
# (SKIP_REPEAT 300 s), warm JVM per SF, host otherwise idle.
# Produces the three committed artifacts BENCHFULL{,_sf1,_sf10}.json.
# Raw per-slot progress streams to /tmp/sweep_<sf>.log.
set -e
cd /root/repo
export SPARK_GRAFT_QUERY_BUDGET_SEC=1500

echo "=== sweep sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCHFULL_OUT=/root/repo/BENCHFULL.json \
  sbt -batch "runMain graft.Bench" > /tmp/sweep_sf0.1.log 2>&1
tail -2 /tmp/sweep_sf0.1.log

echo "=== sweep sf1 ==="
SPARK_GRAFT_SF_DIR=/root/repo/scratch/sf1 \
SPARK_GRAFT_BENCHFULL_OUT=/root/repo/BENCHFULL_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/sweep_sf1.log 2>&1
tail -2 /tmp/sweep_sf1.log

echo "=== sweep sf10 ==="
SPARK_GRAFT_SF_DIR=/root/repo/scratch/sf10 \
SPARK_GRAFT_BENCHFULL_OUT=/root/repo/BENCHFULL_sf10.json \
  sbt -batch "runMain graft.Bench" > /tmp/sweep_sf10.log 2>&1
tail -2 /tmp/sweep_sf10.log

# Third-decade probe (round 13): only the 12 benchOnly production twins,
# the documented cost-step (q162) and the round-12 pack-fix family
# (q131/q132) — the slots whose slope story carries above the full-sweep
# decades — as a committed artifact instead of RunOne prose.
echo "=== sweep sf30 (twins-only) ==="
SPARK_GRAFT_SF_DIR=/root/repo/scratch/sf30 \
SPARK_GRAFT_BENCHFULL_OUT=/root/repo/BENCHFULL_sf30.json \
SPARK_GRAFT_SLOT_FILTER='^(q137_knn_join_prod|q168_semdedup_prod|q12_neardup_minhash_prod|q40_neardup_ngram_prod|q183_sq8_ivf_prod|q172_mmr_prod|q174_trim_prod|q187_bitext_prod|q173_rrf_prod|q55_range_join_prod|q142_split_leakage_prod|q192_bitext_bidi_prod|q162_ngram_hitters|q131_pack_windows|q132_pack_bpe_ids)$' \
  sbt -batch "runMain graft.Bench" > /tmp/sweep_sf30.log 2>&1
tail -2 /tmp/sweep_sf30.log

echo "=== all sweeps done ==="
