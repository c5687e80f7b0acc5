"""Free-space ray accumulation (the reference's K4 DDA march,
gvom.py:1091-1150).

Semantics: every kept point traces a ray from the ego position toward the
point in normalized (voxel-unit) space, stepping so the dominant axis advances
exactly one voxel per step, incrementing the pass count of each traversed
voxel, stopping at the grid boundary or once the accumulated step length
reaches ray_length − 1. Because step k's position is start + k·(slope/|s_dom|)
(an exact affine function) and the grid box is convex, "stopped at boundary"
is equivalent to masking out-of-bounds samples — no sequential state.

Implementations:
  * xla: per-step vectorized scatter-add (portable; used on CPU test meshes).
  * matmul (Pallas/MXU): all rays of a scan share the ego, so at step k every
    dominant-x ray lands in the same x slice — the march collapses into
    per-(axis, sign, step) 2D histograms over the two non-dominant
    coordinates, computed as one-hot matmuls with f32 accumulation (exact
    integer counts). See ops/pallas_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops import grid as gridops

__all__ = ["ray_geometry", "ray_pass_counts_xla", "ray_pass_counts"]


def ray_geometry(cfg: GvomConfig, points: jnp.ndarray, keep: jnp.ndarray, ego_position: jnp.ndarray):
    """Per-ray march parameters, shared by all implementations.

    Returns (start [3], step [N,3], delta [N] — per-step length cost,
    budget [N] = ray_length − 1, dom [N]); step k (1-based) is taken iff
    (k−1)·delta < budget, matching gvom.py:1127,1150 bit-for-bit in f32.
    """
    res = gridops.resolution_vector(cfg)
    start = ego_position.astype(jnp.float32) / res
    end = points / res
    slope = end - start[None, :]
    length = jnp.sqrt(jnp.sum(slope * slope, axis=1))
    ok = keep & (length > 0)
    s = jnp.where(ok[:, None], slope / jnp.where(length > 0, length, 1.0)[:, None], 0.0)
    a = jnp.abs(s)
    smax = jnp.max(a, axis=1)
    dom = jnp.where(smax == a[:, 2], 2, jnp.where(smax == a[:, 1], 1, 0))
    absdom = smax  # == a[dom] by construction; avoids a [N,3] gather
    ok = ok & (absdom > 0)
    safe = jnp.where(absdom > 0, absdom, 1.0)
    step = s / safe[:, None]
    # the dominant component is mathematically ±1 — force it exactly.
    # XLA:TPU lowers the division to reciprocal-multiply, and
    # s_dom·fl(1/|s_dom|) can be ±(1+2⁻²³); at integer-valued starts that
    # 1-ulp drift moves floor(start_dom ± k) one whole row after the first
    # step (measured: ~4k displaced voxels/scan at an ego on a cell edge).
    # Exact ±1 keeps the dominant-axis march integer-exact on every backend
    # (the invariant the matmul raycast's placement relies on).
    step = jnp.where(jnp.arange(3)[None, :] == dom[:, None], jnp.sign(s), step)
    delta = 1.0 / safe
    budget = jnp.where(ok, length - 1.0, -1.0)
    return start, step, delta, budget, dom


def ray_pass_counts_xla(
    cfg: GvomConfig,
    points: jnp.ndarray,
    keep: jnp.ndarray,
    ego_position: jnp.ndarray,
    origin: jnp.ndarray,
    y_window=None,
) -> jnp.ndarray:
    """Portable scatter-add implementation.

    y_window = (ys0, Ys): accumulate only the torus y-slab [ys0, ys0+Ys) —
    the spatially sharded ingest's slab-local output ([X, Ys, Z])."""
    ys0, Ys = (None, cfg.xy_size) if y_window is None else y_window
    shape = (cfg.xy_size, Ys, cfg.z_size)
    start, step, delta, budget, dom = ray_geometry(cfg, points, keep, ego_position)
    size = gridops.size_vector(cfg)
    # origin subtraction is folded into the start once, so the per-step
    # position is exactly `start_rel + k*step` — the same two-op expression
    # the oracle evaluates (no reassociation freedom for the compiler)
    start_rel = start - origin.astype(jnp.float32)
    # dominant-axis row in INTEGER arithmetic: floor(start) ± k, the exact
    # real-number value of floor(start_dom + k·(±1)). The f32 sum rounds when
    # start_dom sits within a half-ulp of an integer and start+k crosses a
    # binade (e.g. fl32(101−2⁻¹⁶)+156 → 257.0, floor 257 vs the true 256), so
    # flooring it makes the placed row input-dependent per step. All paths
    # (this one, the Pallas block-write placement, the numpy oracle) use the
    # integer convention so they agree by construction on knife-edge rays.
    start_i = jnp.floor(start_rel).astype(jnp.int32)                   # [3]
    s_dom = jnp.where(dom == 0, step[:, 0], jnp.where(dom == 1, step[:, 1], step[:, 2]))
    sgn_i = jnp.where(s_dom < 0, -1, 1).astype(jnp.int32)
    x0_dom = start_i[dom]                                              # [N]

    def body(k, acc):
        kf = k.astype(jnp.float32)
        # barrier the products: mul-then-add with two separate roundings, in
        # EVERY graph context. Without it XLA:TPU may fuse these into fmas
        # depending on what else shares the graph, flipping knife-edge floors
        # / liveness tests by 1 ulp vs the Pallas kernels and the numpy
        # oracle (both of which round the product) — measured as ~4k paired
        # ±1 voxel diffs in a fused Pallas-vs-XLA graph (scratch/ray_diff_*).
        pos = start_rel[None, :] + jax.lax.optimization_barrier(kf * step)
        vox = jnp.floor(pos).astype(jnp.int32)
        dom_row = x0_dom + k * sgn_i
        vox = jnp.where(jnp.arange(3)[None, :] == dom[:, None], dom_row[:, None], vox)
        inb = jnp.all((vox >= 0) & (vox < size[None, :]), axis=1)
        act = (jax.lax.optimization_barrier((kf - 1.0) * delta) < budget) & inb
        vt = (vox + origin[None, :]) % size[None, :]       # torus placement
        ty = vt[:, 1] if ys0 is None else vt[:, 1] - ys0
        if ys0 is not None:
            act = act & (ty >= 0) & (ty < Ys)
        vc0 = jnp.where(act, vt[:, 0], 0)
        vc1 = jnp.where(act, ty, 0)
        vc2 = jnp.where(act, vt[:, 2], 0)
        return acc.at[vc0, vc1, vc2].add(act.astype(jnp.int32))

    return jax.lax.fori_loop(1, cfg.ray_steps + 1, body, jnp.zeros(shape, jnp.int32))


def ray_pass_counts(
    cfg: GvomConfig,
    points: jnp.ndarray,
    keep: jnp.ndarray,
    ego_position: jnp.ndarray,
    origin: jnp.ndarray,
    impl: str = "auto",
    y_window=None,
) -> jnp.ndarray:
    if impl in ("auto", "matmul"):
        try:
            from gvom_tpu.ops import pallas_kernels

            if impl == "matmul" or pallas_kernels.use_fast_path():
                return pallas_kernels.ray_pass_counts_matmul(
                    cfg, points, keep, ego_position, origin, y_window=y_window
                )
        except ImportError:
            pass
    return ray_pass_counts_xla(cfg, points, keep, ego_position, origin, y_window=y_window)
