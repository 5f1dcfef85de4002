"""Value-level probes on the REAL chip for roll/prefix/radix/bitcast —
interpret mode agreed with numpy; hardware semantics may differ."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from reindexer_tpu.ops.pallas_select import (_key_i32, _prefix_lanes,
                                             _radix_kth, _unkey_f32)

Q, G = 8, 256


def pcall(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel, out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*args)


rng = np.random.default_rng(0)
x = rng.normal(size=(Q, G)).astype(np.float32)
xd = jnp.asarray(x)

# roll direction
def k_roll(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 1, axis=1)
r = np.asarray(pcall(k_roll, jax.ShapeDtypeStruct((Q, G), jnp.float32), xd))
fwd = np.allclose(r[:, 1:], x[:, :-1])      # element l -> l+1
bwd = np.allclose(r[:, :-1], x[:, 1:])      # element l -> l-1
print("roll(+1): forward:", fwd, "backward:", bwd, flush=True)

# prefix sum
def k_pref(x_ref, o_ref):
    o_ref[:] = _prefix_lanes(x_ref[:], axis=1)
r = np.asarray(pcall(k_pref, jax.ShapeDtypeStruct((Q, G), jnp.float32), xd))
want = np.cumsum(x, axis=1)
print("prefix ok:", np.allclose(r, want, rtol=1e-5, atol=1e-4), flush=True)

# radix kth largest
def k_radix(x_ref, o_ref):
    o_ref[:] = _radix_kth(x_ref[:], 10.0, axis=1)
r = np.asarray(pcall(k_radix, jax.ShapeDtypeStruct((Q, 1), jnp.float32), xd))
want = np.sort(x, axis=1)[:, -10:-9]
print("radix kth ok:", np.allclose(r, want), "got", r[:2, 0], "want",
      want[:2, 0], flush=True)

# key/unkey roundtrip + order
def k_key(x_ref, o_ref):
    o_ref[:] = _unkey_f32(_key_i32(x_ref[:]))
r = np.asarray(pcall(k_key, jax.ShapeDtypeStruct((Q, G), jnp.float32), xd))
print("key roundtrip ok:", np.array_equal(r, x), flush=True)

def k_keyorder(x_ref, o_ref):
    o_ref[:] = _key_i32(x_ref[:]).astype(jnp.float32)
r = np.asarray(pcall(k_keyorder, jax.ShapeDtypeStruct((Q, G), jnp.float32),
                     xd))
ordx = np.argsort(x, axis=1)
ordk = np.argsort(r, axis=1)
print("key order ok:", np.array_equal(ordx, ordk), flush=True)
print("done", flush=True)
