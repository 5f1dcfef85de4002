"""Fresh-array download bandwidth: the tunnel client caches a host mirror
after the first np.asarray of any given array, so repeated-read probes lie
(probe_download_bw.py measured ~0ms). Here every measurement reads a DISTINCT
freshly-computed device array exactly once.

Run: python tools/probe_download_bw2.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    @jax.jit
    def mk(x, s):
        return x * s

    for mb in (1, 4, 16, 64):
        n = int(mb * (1 << 18))
        base = jax.device_put(rng.random(n).astype(np.float32))
        base.block_until_ready()
        samples = []
        for i in range(4):
            y = mk(base, 1.0 + 1e-6 * i)   # distinct fresh result each time
            y.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(y)
            samples.append(time.perf_counter() - t0)
        dt = min(samples)
        print(f"# fresh download {mb}MB: min {dt*1e3:.1f}ms = {mb/dt:.1f} "
              f"MB/s  (all: {[f'{s*1e3:.0f}' for s in samples]})",
              file=sys.stderr, flush=True)

    # does block_until_ready + idle time trigger client-side prefetch?
    y = mk(jax.device_put(rng.random(4 << 18).astype(np.float32)), 1.5)
    y.block_until_ready()
    time.sleep(2.0)
    t0 = time.perf_counter()
    np.asarray(y)
    print(f"# 4MB after 2s idle: {(time.perf_counter()-t0)*1e3:.1f}ms",
          file=sys.stderr, flush=True)
    print("exit=0", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
