#!/bin/bash
# Round-10 measurement chain (VERDICT r9 #4 and #8), run sequentially on
# an idle box. Each step writes raw JSONL/stdout to /tmp/*.jsonl —
# curate the lines you keep into measurements/ by hand afterwards
# (that copy is a deliberate review step, e.g.
# `cp /tmp/wh_zipf128.jsonl measurements/wh_policy_zipf_x128.jsonl`).
set -u
cd /root/repo

echo "=== [1/4] zipf x128, recommended 128x policy (nocomp) + auto ==="
SPARK_GRAFT_DRIVER_MEM=48g python scripts/warehouse_policy_scale.py \
    /tmp/spark_graft_sf_zipf_x128 nocomp auto \
    > /tmp/wh_zipf128.jsonl 2> /tmp/wh_zipf128.err
echo "rc=$? lines=$(wc -l < /tmp/wh_zipf128.jsonl)"

echo "=== [2/4] zipf x256, recommended 256x policy (parquet) + auto ==="
SPARK_GRAFT_DRIVER_MEM=64g python scripts/warehouse_policy_scale.py \
    /tmp/spark_graft_sf_zipf_x256 parquet auto \
    > /tmp/wh_zipf256.jsonl 2> /tmp/wh_zipf256.err
echo "rc=$? lines=$(wc -l < /tmp/wh_zipf256.jsonl)"

echo "=== [3/4] streaming kill-and-resume at 256x (25.6M events) ==="
SPARK_GRAFT_DRIVER_MEM=64g python scripts/stream_e2e_scale.py \
    /tmp/spark_graft_sf_x256 64 8 \
    > /tmp/stream256.out 2> /tmp/stream256.err
echo "rc=$?"
grep -h "^#" /tmp/stream256.err | tail -5

echo "=== [4/4] streaming hot-user (~2000x hot key) at 256x ==="
SPARK_GRAFT_DRIVER_MEM=64g python scripts/stream_e2e_scale.py \
    /tmp/spark_graft_sf_x256 64 8 --hot-user \
    > /tmp/stream256_hot.out 2> /tmp/stream256_hot.err
echo "rc=$?"
grep -h "^#" /tmp/stream256_hot.err | tail -5
echo "ALL_MEASUREMENTS_DONE"
