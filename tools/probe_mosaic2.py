"""Second round of Mosaic probes for the v2 selection kernel epilogue."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_mosaic import run, pcall

Q, T, GL, C, S = 64, 2048, 32, 64, 256


def main():
    rng = np.random.default_rng(0)
    st = jnp.asarray(rng.normal(size=(T, Q)).astype(np.float32))
    cand = jnp.asarray(rng.normal(size=(Q, C, S)).astype(np.float32))

    # P13: [T,Q] -> [gl,c,Q] -> permute (2,1,0) -> [Q,c,gl]
    def k13(x_ref, o_ref):
        r = x_ref[:].reshape(GL, C, Q)
        o_ref[:] = jnp.transpose(r, (2, 1, 0))
    run("P13 permute (2,1,0) [gl,c,Q]->[Q,c,gl]",
        lambda: pcall(k13, jax.ShapeDtypeStruct((Q, C, GL), jnp.float32),
                      st))

    # P13b: fallback: (2,0,1) then batched last-two transpose (0,2,1)
    def k13b(x_ref, o_ref):
        r = jnp.transpose(x_ref[:].reshape(GL, C, Q), (2, 0, 1))
        o_ref[:] = jnp.transpose(r, (0, 2, 1))
    run("P13b (2,0,1)+(0,2,1) [gl,c,Q]->[Q,c,gl]",
        lambda: pcall(k13b, jax.ShapeDtypeStruct((Q, C, GL), jnp.float32),
                      st))

    # P14: epilogue fine-layout: 8 static sublane slices + lane concat
    def k14(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jnp.concatenate(
            [x[:, f * 8:(f + 1) * 8, :] for f in range(8)], axis=2)
    run("P14 sublane slices + lane concat -> [Q,8,8S]",
        lambda: pcall(k14, jax.ShapeDtypeStruct((Q, 8, 8 * S), jnp.float32),
                      cand))

    # P15: multi-axis reductions on 3D [Q,8,2048] -> [Q,1,1]
    x15 = jnp.asarray(rng.normal(size=(Q, 8, 8 * S)).astype(np.float32))

    def k15(x_ref, o_ref):
        x = x_ref[:]
        m = jnp.max(x, axis=(1, 2), keepdims=True)
        s = jnp.sum(jnp.where(x > 0, 1.0, 0.0), axis=(1, 2), keepdims=True)
        o_ref[:] = m + s
    run("P15 multi-axis max/sum [Q,8,2048]->[Q,1,1]",
        lambda: pcall(k15, jax.ShapeDtypeStruct((Q, 1, 1), jnp.float32),
                      x15))

    # P16: in-group lane butterfly max via roll (8-wide groups) on [Q,8,2048]
    def k16(x_ref, o_ref):
        m = x_ref[:]
        lanes = jax.lax.broadcasted_iota(jnp.int32, m.shape, 2)
        for sh in (1, 2, 4):
            up = pltpu.roll(m, -sh, axis=2)
            dn = pltpu.roll(m, sh, axis=2)
            bit = jnp.bitwise_and(jnp.right_shift(lanes,
                                                  sh.bit_length() - 1), 1)
            m = jnp.maximum(m, jnp.where(bit == 1, dn, up))
        o_ref[:] = m
    run("P16 8-group butterfly max on lanes",
        lambda: pcall(k16, jax.ShapeDtypeStruct((Q, 8, 8 * S), jnp.float32),
                      x15))

    # P17: dot accumulation into 3D scratch across grid steps
    def k17(x_ref, s_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        xt = jnp.transpose(x_ref[:].reshape(GL, C, Q), (2, 1, 0))
        acc[:] += jax.lax.dot_general(
            xt.astype(jnp.bfloat16), s_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]
    big = jnp.asarray(rng.normal(size=(4 * T, Q)).astype(np.float32))
    sel = jnp.asarray(
        (rng.random(size=(Q, GL, S)) < 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)
    run("P17 grid dot-accumulate [Q,C,S] scratch",
        lambda: pl.pallas_call(
            k17, grid=(4,),
            in_specs=[pl.BlockSpec((T, Q), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((Q, GL, S), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((Q, C, S), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, C, S), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Q, C, S), jnp.float32)])(big, sel))

    # P18: f32 batched dot [Q,1,GL]x[Q,GL,S] (kid accumulation)
    def k18(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    a18 = jnp.asarray(rng.normal(size=(Q, 1, GL)).astype(np.float32))
    b18 = jnp.asarray(rng.normal(size=(Q, GL, S)).astype(np.float32))
    run("P18 f32 dot [Q,1,GL]x[Q,GL,S]",
        lambda: pl.pallas_call(
            k18, out_shape=jax.ShapeDtypeStruct((Q, 1, S), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a18, b18))


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
    print("done", flush=True)
