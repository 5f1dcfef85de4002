"""Measure REAL device->host download bandwidth through the tunnel.

The earlier probe (probe_ft_dense.py bw_probes) used jnp.zeros, whose
buffers the client appears to satisfy locally (reported 323 GB/s). This
one round-trips random data that must cross the wire, one transfer per
measurement, and also measures chunked vs single-shot transfers.

Run: python tools/probe_download_bw.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def floor_time(fn, reps=3, rounds=5):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    # force a device-side computation so the result buffer only exists
    # device-side (device_put alone may keep the host mirror)
    for mb in (0.0625, 0.25, 1, 4, 16):
        n = int(mb * (1 << 18))
        h = rng.random(n).astype(np.float32)
        x = (jax.device_put(h) * 1.0000001).block_until_ready()
        dt = floor_time(lambda: np.asarray(x))
        print(f"# download f32 {mb}MB: {dt*1e3:.2f}ms = {mb/dt:.1f} MB/s",
              file=sys.stderr, flush=True)
    # int32 (doc ids)
    n = 4 << 18
    hi = rng.integers(0, 1 << 20, n).astype(np.int32)
    xi = (jax.device_put(hi) + 1).block_until_ready()
    dt = floor_time(lambda: np.asarray(xi))
    print(f"# download i32 4MB: {dt*1e3:.2f}ms = {4/dt:.1f} MB/s",
          file=sys.stderr, flush=True)
    # two transfers back-to-back vs one double-size (RTT amortization)
    h2 = rng.random(2 * (4 << 18)).astype(np.float32)
    x2 = (jax.device_put(h2) * 1.0000001).block_until_ready()
    dt2 = floor_time(lambda: (np.asarray(x2[: 4 << 18]),
                              np.asarray(x2[4 << 18:])))
    dt1 = floor_time(lambda: np.asarray(x2))
    print(f"# 8MB one-shot {dt1*1e3:.2f}ms vs 2x4MB {dt2*1e3:.2f}ms",
          file=sys.stderr, flush=True)
    # jax.device_get of a tuple (what selector does)
    a = (jax.device_put(rng.random(1 << 20).astype(np.float32)) * 1.0000001
         ).block_until_ready()
    b = (jax.device_put(rng.integers(0, 1 << 20, 1 << 20).astype(np.int32))
         + 1).block_until_ready()
    dt = floor_time(lambda: jax.device_get((a, b)))
    print(f"# device_get (4MB f32 + 4MB i32): {dt*1e3:.2f}ms",
          file=sys.stderr, flush=True)
    print("exit=0", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
