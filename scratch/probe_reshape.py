"""Probe: does Mosaic (v5e) support in-kernel reshapes between y-paired and
unpacked orientations? [R, 2Z] -> [2R, Z] and the stack-merge variant."""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

R, Z = 128, 64

def k_reshape(x_ref, o_ref):
    o_ref[...] = jnp.reshape(x_ref[...], (2 * R, Z))

def k_stack(x_ref, o_ref):
    x = x_ref[...]
    lo, hi = x[:, :Z], x[:, Z:]
    o_ref[...] = jnp.stack([lo, hi], axis=1).reshape(2 * R, Z)

def k_concat_interleave(x_ref, o_ref):
    # mom-mask orientation: produce [2R, 2Z] where row y = concat(m_half, m_half)
    x = x_ref[...]
    lo, hi = x[:, :Z], x[:, Z:]
    even = jnp.concatenate([lo, lo], axis=1)
    odd = jnp.concatenate([hi, hi], axis=1)
    o_ref[...] = jnp.stack([even, odd], axis=1).reshape(2 * R, 2 * Z)

x = jnp.arange(R * 2 * Z, dtype=jnp.int32).reshape(R, 2 * Z)
ref = np.asarray(x).reshape(2 * R, Z)

for name, kern, oshape, refv in [
    ("reshape", k_reshape, (2 * R, Z), ref),
    ("stack", k_stack, (2 * R, Z), ref),
    ("concat_interleave", k_concat_interleave, (2 * R, 2 * Z),
     np.concatenate([ref, ref], axis=1)),
]:
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.int32),
        )(x)
        ok = np.array_equal(np.asarray(out), refv)
        print(f"{name}: compiled, correct={ok}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
