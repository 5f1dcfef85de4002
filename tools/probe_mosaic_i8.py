"""Mosaic capability probe: batched int8 x int8 -> int32 dot_general.

If this lowers and is value-exact, the v4 compaction can move scores as
FOUR i8 byte-planes of the f32 bitcast (exact in i32 accumulation, no
3-limb bf16 split, int8 MXU at 2x bf16 rate). Run on hw:
    python tools/probe_mosaic_i8.py
"""
import sys

import numpy as np
import jax

if "--interpret" in sys.argv:          # CPU check of the probe itself
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, s_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], s_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)


def probe(interpret=False):
    Q, R, G, S = 8, 16, 128, 128
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, size=(Q, R, G)).astype(np.int8)
    sel = np.zeros((Q, G, S), dtype=np.int8)
    ranks = rng.integers(0, S, size=(Q, G))
    for q in range(Q):
        for g in range(G):
            sel[q, g, ranks[q, g]] = 1
    out = pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, R, S), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(x), jnp.asarray(sel))
    want = np.einsum("qrg,qgs->qrs", x.astype(np.int32),
                     sel.astype(np.int32))
    ok = (np.asarray(out) == want).all()
    print(f"i8 batched dot_general -> i32: "
          f"{'EXACT' if ok else 'WRONG VALUES'}")
    return ok


if __name__ == "__main__":
    try:
        ok = probe(interpret="--interpret" in sys.argv)
        sys.exit(0 if ok else 2)
    except Exception as e:  # lowering failure = capability absent
        print(f"i8 dot FAILED to lower/run: {type(e).__name__}: {e}")
        sys.exit(1)
