"""Round-4 microbenches: the ingest tail (sorts, count hists, placement).

Each candidate is timed as a 64-iteration chained lax.scan (same amortization
as bench.py) on whatever backend is live.

CAUTION on interpreting results (r4 post-mortem): the probe sums each
output, and XLA legally folds order-invariant reductions THROUGH a sort —
sort6_2key measured 0.001 ms because `sum(sort(x)) == sum(x)` let the whole
sort be eliminated. Only the gather variants (not foldable) and the
count-hist rows are trustworthy here. The authoritative per-op numbers come
from scratch/traceprof.py; this file is kept as the record of WHY gathers
were rejected (1-D gathers of 131k elements cost ~1-2 ms each on v5e, so
sort payloads stay multi-operand).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

N = 131072 + 2048
STEPS = 64


def timed(name, fn, *args):
    @jax.jit
    def run(a):
        def step(c, i):
            out = fn(*[x + (c * 0).astype(x.dtype) if x.dtype != bool else x
                       for x in a], i)
            probe = sum(jnp.sum(o).astype(jnp.float32) for o in out)
            return c + 0.0 * probe, probe

        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(STEPS))

    out = run(args)
    jax.block_until_ready(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"micro": name, "ms": round(best / STEPS * 1e3, 3)}))


def main():
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.integers(0, 260 * 262 * 66, N).astype(np.int32))
    fz = jnp.asarray(rng.random(N).astype(np.float32))
    px = jnp.asarray(rng.random(N).astype(np.float32) * 260)
    py = jnp.asarray(rng.random(N).astype(np.float32) * 262)
    pz = jnp.asarray(rng.random(N).astype(np.float32) * 66)
    key3 = jnp.asarray(rng.integers(0, 6 * 140, N).astype(np.int32))
    su = px / 260.0
    sv = py / 262.0
    print(f"[micro] device: {jax.devices()[0]}", file=sys.stderr)

    fzbits = jax.lax.bitcast_convert_type(fz, jnp.int32)
    iota = jnp.arange(N, dtype=jnp.int32)

    # --- moments-path sort variants ---
    timed("sort6_2key(current)",
          lambda vid, fzb, px, py, pz, fz, i: jax.lax.sort(
              (vid + i * 0, fzb, px, py, pz, fz), num_keys=2),
          vid, fzbits, px, py, pz, fz)
    timed("sort3_2key+4gather",
          lambda vid, fzb, px, py, pz, fz, i: (lambda s: (
              s[0], s[1], px[s[2]], py[s[2]], pz[s[2]], fz[s[2]]))(
              jax.lax.sort((vid + i * 0, fzb, iota), num_keys=2)),
          vid, fzbits, px, py, pz, fz)
    # --- raycast-path sort variants ---
    timed("sort3_1key(current)",
          lambda k, su, sv, i: jax.lax.sort((k + i * 0, su, sv), num_keys=1),
          key3, su, sv)
    timed("sort2_1key+2gather",
          lambda k, su, sv, i: (lambda s: (s[0], su[s[1]], sv[s[1]]))(
              jax.lax.sort((k + i * 0, iota), num_keys=1)),
          key3, su, sv)

    # --- per-slice counts: one-hot matmul vs searchsorted on sorted keys ---
    key_sorted = jnp.sort(vid // (262 * 66))          # x-slice keys, sorted
    bounds = jnp.arange(261, dtype=jnp.int32)

    def cnt_onehot(ks, i):
        oh = (ks[:, None] == bounds[None, :261]).astype(jnp.bfloat16)
        c = jax.lax.dot_general(oh, jnp.ones((N, 1), jnp.bfloat16),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[:, 0]
        return (c.astype(jnp.int32),)

    def cnt_ss(ks, i):
        return (jnp.searchsorted(ks, bounds + i * 0, method="compare_all"),)

    timed("cnt_onehot(current)", cnt_onehot, key_sorted)
    timed("cnt_searchsorted_cmpall", cnt_ss, key_sorted)

    # --- raycast (group, step) live counts: one-hot pair vs searchsorted ---
    S = 139
    keyr = jnp.sort(key3)

    def live_onehot(ks, i):
        g = ks // (S + 2)
        kmax = (S + 1) - ks % (S + 2)
        ohg = (g[:, None] == jnp.arange(6)[None, :]).astype(jnp.bfloat16)
        ohk = (kmax[:, None] == jnp.arange(S + 1)[None, :]).astype(jnp.bfloat16)
        alive = (kmax > 0).astype(jnp.bfloat16)
        cnt = jax.lax.dot_general(ohg * alive[:, None], ohk,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        live = jnp.flip(jnp.cumsum(jnp.flip(cnt.astype(jnp.int32), 1), 1), 1)
        sizes = jax.lax.dot_general(ohg, jnp.ones((N, 1), jnp.bfloat16),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)[:, 0]
        return live, sizes.astype(jnp.int32)

    def live_ss(ks, i):
        # ks sorted ascending by g*(S+2) + (S+1-kmax): rays of group g with
        # kmax >= s are exactly those with key < g*(S+2) + (S+2-s)
        q = (jnp.arange(6)[:, None] * (S + 2)
             + (S + 2 - jnp.arange(S + 1)[None, :]) + i * 0)
        base = jnp.arange(7)[:, None] * (S + 2)
        lo = jnp.searchsorted(ks, base[:, 0], method="compare_all")
        hi = jnp.searchsorted(ks, q.reshape(-1), method="compare_all").reshape(6, S + 1)
        live = hi - lo[:6, None]
        sizes = lo[1:] - lo[:6]
        return live, sizes

    timed("live_onehot(current)", live_onehot, keyr)
    timed("live_searchsorted", live_ss, keyr)


if __name__ == "__main__":
    main()


def lane_util():
    """Is a [*, 64]-minor array 2x-padded (T(8,128))? Compare elementwise
    pass cost at minor 64 vs 128 vs the same total in a [.., 128] shape."""
    a64 = jnp.ones((256, 256, 64), jnp.int32)
    a128 = jnp.ones((256, 256, 128), jnp.int32)
    b128 = jnp.ones((256, 128, 128), jnp.int32)   # same elements as a64
    timed("ew_256x256x64_i32", lambda x, i: (x + i,), a64)
    timed("ew_256x256x128_i32", lambda x, i: (x + i,), a128)
    timed("ew_256x128x128_i32", lambda x, i: (x + i,), b128)
    f64_ = jnp.ones((256, 256, 64), jnp.float32)
    timed("ew_256x256x64_f32", lambda x, i: (x + i,), f64_)


if __name__ == "__main__":
    lane_util()
