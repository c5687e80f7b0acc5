"""Probe: scalar-prefetched output index map (write blocks x-rolled)."""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X, W, U = 16, 4, 128

def kernel(s_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0

n = X // W
x = jnp.arange(X * U * 128, dtype=jnp.float32).reshape(X, U, 128)
roll = jnp.array([2], jnp.int32)  # roll by 2 BLOCKS (W*2 rows)

out = pl.pallas_call(
    kernel,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((W, U, 128), lambda xb, s: (xb, 0, 0))],
        out_specs=pl.BlockSpec((W, U, 128), lambda xb, s: ((xb + s[0]) % n, 0, 0)),
    ),
    out_shape=jax.ShapeDtypeStruct((X, U, 128), jnp.float32),
)(roll, x)
ref = np.roll(np.asarray(x) * 2.0, 2 * W, axis=0)
print("prefetch-roll:", np.array_equal(np.asarray(out), ref))
