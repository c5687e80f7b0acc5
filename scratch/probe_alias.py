"""Probe: input_output_aliases + scalar-prefetch + manual DMA row writes
into an aliased HBM buffer at a dynamic (slot, rolled-row) position."""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B1, X, U, V = 3, 16, 8, 128
W = 4
n = X // W

def kernel(s_ref, x_hbm, buf_hbm, obuf, scratch, sems):
    xb = pl.program_id(0)
    slot = s_ref[0]
    roll = s_ref[1]
    pltpu.make_async_copy(x_hbm.at[pl.ds(xb * W, W)], scratch.at[0], sems.at[0]).start()
    pltpu.make_async_copy(x_hbm.at[pl.ds(xb * W, W)], scratch.at[0], sems.at[0]).wait()
    for w in range(W):
        row = (xb * W + w + roll) % X
        scratch[1, w] = scratch[0, w] * 3.0
        pltpu.make_async_copy(scratch.at[1, w], obuf.at[slot, row], sems.at[1]).start()
        pltpu.make_async_copy(scratch.at[1, w], obuf.at[slot, row], sems.at[1]).wait()

x = jnp.arange(X * U * V, dtype=jnp.float32).reshape(X, U, V)
buf = jnp.ones((B1, X, U, V), jnp.float32) * 7.0
scal = jnp.array([1, 5], jnp.int32)

out = pl.pallas_call(
    kernel,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((2, W, U, V), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    ),
    out_shape=jax.ShapeDtypeStruct((B1, X, U, V), jnp.float32),
    input_output_aliases={2: 0},
)(scal, x, buf)
ref = np.ones((B1, X, U, V), np.float32) * 7.0
ref[1] = np.roll(np.asarray(x) * 3.0, 5, axis=0)
print("alias-slot-roll:", np.array_equal(np.asarray(out), ref))
