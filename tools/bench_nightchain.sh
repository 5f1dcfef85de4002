#!/bin/bash
# Master measurement chain: waits for the tunnel, then runs every pending
# on-chip measurement back to back with per-step logs.
cd /root/repo
probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
jax.devices(); x = jnp.ones((8,8)); float(x.sum()); print('TUNNEL-OK')" \
    2>/dev/null | grep -q TUNNEL-OK
}
echo "$(date +%T) waiting for tunnel..."
until probe; do sleep 60; done
echo "$(date +%T) tunnel up"

echo "$(date +%T) [1/6] v4 stack timings"
timeout 3600 python -u /tmp/v4_d.py > /tmp/v4_d.log 2>&1
grep "#" /tmp/v4_d.log

echo "$(date +%T) [2/6] headline bench"
timeout 2400 python -u bench.py --extras 1 > /tmp/bench_full.log 2>&1
tail -5 /tmp/bench_full.log

echo "$(date +%T) [3/6] ft1m"
timeout 1800 python -u bench.py --config ft1m > /tmp/bench_ft1m.log 2>&1
grep "#" /tmp/bench_ft1m.log | tail -3

echo "$(date +%T) [4/6] ivf1m"
timeout 3600 python -u bench.py --config ivf1m > /tmp/bench_ivf1m.log 2>&1
grep "#" /tmp/bench_ivf1m.log | tail -8

echo "$(date +%T) [5/6] serving vec_bf 65k"
timeout 1800 python -u tools/bench_serving.py 65536 128 8 \
    > /tmp/serv_bf.log 2>&1
grep "# serving" /tmp/serv_bf.log

echo "$(date +%T) [6/6] serving hnsw 1M"
timeout 5400 python -u tools/bench_serving.py 1000000 96 8 hnsw ip \
    > /tmp/serv_hnsw.log 2>&1
grep -E "# serving|# loaded" /tmp/serv_hnsw.log
echo "NIGHTCHAIN-DONE"
