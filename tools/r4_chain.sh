#!/bin/bash
# Round-4 measurement chain: waits for the current chip job, then runs the
# remaining on-chip legs sequentially with per-step logs.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "$(date +%T) [1/5] ft1m (packed dense in the mixed batch)"
timeout 2400 python -u bench.py --config ft1m > /tmp/r4_ft1m.log 2>&1
grep "#" /tmp/r4_ft1m.log | tail -3

echo "$(date +%T) [2/5] v4 ct matrix"
timeout 3600 python -u tools/bench_v4_matrix.py 12 > /tmp/r4_v4ct.log 2>&1
grep "#" /tmp/r4_v4ct.log | tail -8

echo "$(date +%T) [3/5] serving bf 65k"
timeout 1800 python -u tools/bench_serving.py 65536 128 8 \
    > /tmp/r4_serv_bf.log 2>&1
grep -E "# serving|qps" /tmp/r4_serv_bf.log | tail -5

echo "$(date +%T) [4/5] headline bench (driver dress rehearsal)"
timeout 2400 python -u bench.py --extras 1 > /tmp/r4_bench.log 2>&1
tail -8 /tmp/r4_bench.log

echo "$(date +%T) [5/5] deep1m + pipelined 1M serving"
timeout 7200 python -u tools/bench_serving.py 1000000 96 8 hnsw ip \
    > /tmp/r4_serv_hnsw.log 2>&1
grep -E "# serving|# loaded|qps" /tmp/r4_serv_hnsw.log | tail -6
echo "R4-CHAIN-DONE"
