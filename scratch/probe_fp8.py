"""Probe: does Mosaic v5e lower f8e4m3 dot_general to the MXU, and at what
rate vs bf16, for one-hot histogram shapes [K,64]x[K,128]?"""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, M, N = 1024, 64, 128
REP = 2048

def make(dt):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            return acc + jax.lax.dot_general(
                a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = jax.lax.fori_loop(0, REP, body, jnp.zeros((M, N), jnp.float32))
    return kernel

rng = np.random.default_rng(0)
a8 = (rng.random((K, M)) < 0.03).astype(np.float32)
b8 = (rng.random((K, N)) < 0.03).astype(np.float32)

for name, dt in [("bf16", jnp.bfloat16), ("f8e4m3", jnp.float8_e4m3fn),
                 ("f8e5m2", jnp.float8_e5m2)]:
    try:
        a = jnp.asarray(a8).astype(dt)
        b = jnp.asarray(b8).astype(dt)
        f = pl.pallas_call(make(dt), out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32))
        out = f(a, b); jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); jax.block_until_ready(f(a, b)); ts.append(time.perf_counter() - t0)
        t = min(ts)
        ok = np.allclose(np.asarray(out), (a8.T @ b8) * REP)
        print(f"{name}: {t*1e6:.0f} us for {REP} matmuls ({t*1e9/REP/K:.3f} ns/row), exact={ok}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
