"""Per-grid-step overhead probe: sweep-A latency vs TILE size, with v1's
pass1 (writes the full ps) as an in-window reference point."""
import sys
import time

sys.path.insert(0, "/root/repo")
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_scan import _dot3, _pad_queries
from reindexer_tpu.ops import pallas_scan as v1

N, D, Q = 131072, 128, 64
BLK = 64


def make_bmax(tile):
    gl = tile // BLK

    def _kernel(q_ref, base_ref, bmax_ref):
        tile_v = base_ref[:]
        q = q_ref[:]
        dots_t = _dot3(tile_v, q)
        sumsq = jnp.sum(tile_v * tile_v, axis=1, keepdims=True)
        s_t = 2.0 * dots_t - sumsq
        s_t = jnp.where(sumsq > 0.0, jnp.maximum(s_t, -1e30), -1e30)
        bmax_ref[:] = jnp.max(s_t.reshape(gl, BLK, s_t.shape[1]), axis=1)

    @functools.partial(jax.jit, static_argnames=())
    def run(queries, base):
        n, d = base.shape
        Qn = queries.shape[0]
        return pl.pallas_call(
            _kernel,
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((Qn, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gl, Qn), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // BLK, Qn), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(queries, base)

    return run


def timed(fn, *args, rounds=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 50)
        time.sleep(1.5)
    return best


rng = np.random.default_rng(0)
base = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
q = _pad_queries(jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32)))
sqe = jnp.sum(base * base, axis=1)

# v1 pass1 (ps + bmax, TILE=4096) as the in-window reference
t_ref = timed(lambda: v1._pass1(q, base, sqe[None, :], 4096,
                                VectorMetric.L2))
print(f"# v1 pass1 (dual, ps write, T=4096): {t_ref*1e3:.3f} ms",
      flush=True)

for tile in (2048, 4096, 8192, 16384):
    fn = make_bmax(tile)
    t = timed(fn, q, base)
    print(f"# sweepA TILE={tile}: {t*1e3:.3f} ms  "
          f"({t*1e6/(N//tile):.2f} us/step, {N//tile} steps)", flush=True)
print("done", flush=True)
