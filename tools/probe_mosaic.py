"""Probe Mosaic lowering support for the v2 fused-selection kernel design.

Each probe compiles (and runs once) a tiny Pallas kernel on the real TPU and
prints OK/FAIL. Used to pick layouts for ops/pallas_select.py; results are
recorded in docs/performance.md. Run: python tools/probe_mosaic.py
"""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q, G, T, S, C = 64, 2048, 4096, 128, 64


def run(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"OK   {name}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def pcall(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def main():
    rng = np.random.default_rng(0)
    st = jnp.asarray(rng.normal(size=(T, Q)).astype(np.float32))      # [T, Q]
    sq = jnp.asarray(rng.normal(size=(Q, T)).astype(np.float32))      # [Q, T]
    bm = jnp.asarray(rng.normal(size=(Q, G)).astype(np.float32))
    sel = jnp.asarray(rng.normal(size=(Q, S, T // C)).astype(np.float32))

    # P1: lane-split reshape [Q, T] -> [Q, T/64, 64] + max over lanes
    def k1(x_ref, o_ref):
        o_ref[:] = jnp.max(x_ref[:].reshape(Q, T // C, C), axis=2)
    run("P1 lane-split reshape [Q,T]->[Q,G,64] max ax2",
        lambda: pcall(k1, jax.ShapeDtypeStruct((Q, T // C), jnp.float32), sq))

    # P2: 2D transpose [T, Q] -> [Q, T]
    def k2(x_ref, o_ref):
        o_ref[:] = x_ref[:].T
    run("P2 2D transpose [T,Q]->[Q,T]",
        lambda: pcall(k2, jax.ShapeDtypeStruct((Q, T), jnp.float32), st))

    # P3: sublane-split reshape + 3D transpose (2,0,1): [T,Q]->[g,c,Q]->[Q,g,c]
    def k3(x_ref, o_ref):
        r = x_ref[:].reshape(T // C, C, Q)
        o_ref[:] = jnp.transpose(r, (2, 0, 1))
    run("P3 [T,Q]->[g,c,Q]->transpose(2,0,1)",
        lambda: pcall(k3, jax.ShapeDtypeStruct((Q, T // C, C), jnp.float32),
                      st))

    # P4: batched dot_general bf16 [Q,S,g] x [Q,g,c] -> [Q,S,c]
    x4a = sel.astype(jnp.bfloat16)
    x4b = jnp.asarray(rng.normal(size=(Q, T // C, C))).astype(jnp.bfloat16)

    def k4(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    run("P4 batched dot_general [Q,S,g]x[Q,g,c]",
        lambda: pl.pallas_call(
            k4, out_shape=jax.ShapeDtypeStruct((Q, S, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x4a, x4b))

    # P4b: batched dot_general with batch dim LAST in rhs:
    # sel [Q,S,g] x stR [g,c,Q] -> [Q,S,c]
    x4c = jnp.asarray(rng.normal(size=(T // C, C, Q))).astype(jnp.bfloat16)

    def k4b(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (0,)), ((0,), (2,))),
            preferred_element_type=jnp.float32)
    run("P4b dot_general batch-last rhs [Q,S,g]x[g,c,Q]",
        lambda: pl.pallas_call(
            k4b, out_shape=jax.ShapeDtypeStruct((Q, S, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x4a, x4c))

    # P5: lane prefix-sum via pltpu.roll + iota mask on [Q, G]
    def k5(x_ref, o_ref):
        r = x_ref[:]
        sh = 1
        while sh < G:
            rolled = pltpu.roll(r, sh, axis=1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (Q, G), 1)
            r = r + jnp.where(lanes >= sh, rolled, 0.0)
            sh *= 2
        o_ref[:] = r
    run("P5 lane prefix-sum roll+mask [Q,G]",
        lambda: pcall(k5, jax.ShapeDtypeStruct((Q, G), jnp.float32), bm))

    # P6: bitcast f32<->i32 + bit ops + unsigned-style compares [Q, G]
    def k6(x_ref, o_ref):
        x = x_ref[:]
        s = pltpu.bitcast(x, jnp.int32)
        m = jnp.where(s >= 0, s, jnp.int32(-2147483648) - s)
        u = jnp.bitwise_xor(m, jnp.int32(-2147483648))
        cnt = jnp.sum(jnp.where(u >= 0, 1.0, 0.0), axis=1, keepdims=True)
        back = jnp.where(m >= 0, m, jnp.int32(-2147483648) - m)
        o_ref[:] = pltpu.bitcast(back, jnp.float32) + cnt
    run("P6 bitcast+bitops+compare [Q,G]",
        lambda: pcall(k6, jax.ShapeDtypeStruct((Q, G), jnp.float32), bm))

    # P7: iterative extraction: fori_loop, rowmax, argmin-iota, one-hot accum
    def k7(x_ref, o_ref):
        def body(j, carry):
            s, out = carry
            m = jnp.max(s, axis=1, keepdims=True)
            lanes = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            pos = jnp.min(jnp.where(s == m, lanes, jnp.int32(1 << 30)),
                          axis=1, keepdims=True)
            kl = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
            out = jnp.where(kl == j, m, out)
            s = jnp.where(lanes == pos, float("-inf"), s)
            return s, out
        s0 = x_ref[:]
        out0 = jnp.zeros((Q, 128), jnp.float32)
        _, out = jax.lax.fori_loop(0, 100, body, (s0, out0))
        o_ref[:] = out
    x7 = jnp.asarray(rng.normal(size=(Q, 1024)).astype(np.float32))
    run("P7 iterative extraction fori [Q,1024] k=100",
        lambda: pcall(k7, jax.ShapeDtypeStruct((Q, 128), jnp.float32), x7))

    # P8: pltpu.repeat along lanes [Q,S] -> [Q, S*8]
    def k8(x_ref, o_ref):
        o_ref[:] = pltpu.repeat(x_ref[:], 8, axis=1)
    x8 = jnp.asarray(rng.normal(size=(Q, S)).astype(np.float32))
    run("P8 pltpu.repeat lanes x8",
        lambda: pcall(k8, jax.ShapeDtypeStruct((Q, S * 8), jnp.float32), x8))

    # P9: grid + VMEM scratch accumulation across grid steps, epilogue on
    # last step (the sweep-B skeleton)
    def k9(x_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        acc[:] += jnp.max(x_ref[:], axis=0, keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]
    big = jnp.asarray(rng.normal(size=(8 * 256, Q)).astype(np.float32))
    run("P9 grid scratch accumulate + last-step epilogue",
        lambda: pl.pallas_call(
            k9, grid=(8,),
            in_specs=[pl.BlockSpec((256, Q), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, Q), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Q), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, Q), jnp.float32)])(big))

    # P10: 3D one-hot build via broadcasted compares [Q,S,g] from [Q,g]
    def k10(r_ref, o_ref):
        r = r_ref[:]                                  # [Q, g] ranks
        si = jax.lax.broadcasted_iota(jnp.int32, (Q, S, T // C), 1)
        o_ref[:] = (r[:, None, :].astype(jnp.int32) == si).astype(
            jnp.bfloat16)
    r10 = jnp.asarray(rng.integers(0, S, size=(Q, T // C)).astype(np.int32))
    run("P10 3D one-hot build [Q,S,g]",
        lambda: pcall(k10, jax.ShapeDtypeStruct((Q, S, T // C),
                                                jnp.bfloat16), r10))

    # P11: f32 dot_general batched (exactness alternative to bf16 limbs)
    def k11(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    x11b = jnp.asarray(rng.normal(size=(Q, T // C, C)).astype(np.float32))
    run("P11 batched dot_general f32",
        lambda: pl.pallas_call(
            k11, out_shape=jax.ShapeDtypeStruct((Q, S, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(sel, x11b))

    # P12: lax.cumsum native (maybe supported directly?)
    def k12(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=1)
    run("P12 jnp.cumsum lanes [Q,G]",
        lambda: pcall(k12, jax.ShapeDtypeStruct((Q, G), jnp.float32), bm))


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
    print("done", flush=True)
