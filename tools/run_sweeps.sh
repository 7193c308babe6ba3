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

echo "=== all sweeps done ==="
