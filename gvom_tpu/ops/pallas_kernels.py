"""Pallas TPU kernels for the hot ops.

ray_pass_counts_matmul — the reference's per-point atomic DDA march
(gvom.py:1091-1150) recast as MXU work:

Every ray starts at the ego, and each DDA step advances the dominant axis by
exactly ±1 voxel (step_dom = s_dom/|s_dom| = ±1 in IEEE f32). Group rays by
(dominant axis, sign): within a group, ALL rays occupy the same dominant-axis
cell at step s. The march therefore reduces to, per (group, step), a 2D
histogram of the two non-dominant coordinates — computed as a one-hot matmul
with bf16 one-hots generated in VMEM (0/1 values are exact in bf16; the MXU
accumulates in f32, so counts are exact integers).

Rays are sorted by (group, descending step budget) so each group's rays that
are still alive at step s form a prefix — the kernel's inner chunk loop runs
only over that prefix (counts are computed up front with a small one-hot
matmul histogram), skipping dead work.

The final placement of per-step histograms into the 3D grid is itself a
one-hot matmul over the (tiny) step axis, using dominant-cell rows computed
with exactly the same f32 expression as the XLA fallback — no scatter
anywhere in the path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops import raycast as raycast_mod

__all__ = ["use_fast_path", "ray_pass_counts_matmul"]

_CHUNK = 2048  # rays per inner matmul; K-dim of the one-hot matmul


def use_fast_path() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _hist_kernel(meta_ref, startuv_ref, su_ref, sv_ref, delta_ref, budget_ref, out_ref):
    """One (group, step) instance: histogram the group's live-ray prefix.

    meta_ref (SMEM): [G, S+1, 3] int32 rows of (offset, count, dom_valid)
    startuv_ref (SMEM): [G, 2] f32 — start_rel components on the (u, v) axes
    su/sv/delta/budget (VMEM): [Npad] f32 ray params, group-sorted
    out_ref (VMEM): [1, 1, U, V] f32
    """
    g = pl.program_id(0)
    s = pl.program_id(1) + 1          # steps are 1-based (gvom.py:1127)
    U = out_ref.shape[2]
    V = out_ref.shape[3]
    abase = meta_ref[g, s, 0]         # chunk-aligned window start (Mosaic needs provable alignment)
    nchunks = meta_ref[g, s, 1]
    first = meta_ref[g, s, 2]         # live prefix = [first, first+count)
    count = meta_ref[g, s, 3]
    dom_ok = meta_ref[g, s, 4]
    out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((count > 0) & (dom_ok > 0))
    def _():
        sf = s.astype(jnp.float32)
        start_u = startuv_ref[g, 0]
        start_v = startuv_ref[g, 1]

        def body(c, acc):
            base = pl.multiple_of(abase + c * _CHUNK, _CHUNK)
            su = su_ref[pl.ds(base, _CHUNK)]
            sv = sv_ref[pl.ds(base, _CHUNK)]
            delta = delta_ref[pl.ds(base, _CHUNK)]
            budget = budget_ref[pl.ds(base, _CHUNK)]
            u = jnp.floor(start_u + sf * su).astype(jnp.int32)
            v = jnp.floor(start_v + sf * sv).astype(jnp.int32)
            gi = base + jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)[:, 0]
            live = (gi >= first) & (gi < first + count) & ((sf - 1.0) * delta < budget)
            ok = live & (u >= 0) & (u < U) & (v >= 0) & (v < V)
            uu = jnp.where(ok, u, -1)
            vv = jnp.where(ok, v, -1)
            ohu = (uu[:, None] == jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, U), 1)).astype(jnp.bfloat16)
            ohv = (vv[:, None] == jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, V), 1)).astype(jnp.bfloat16)
            return acc + jax.lax.dot_general(
                ohu, ohv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        acc = jax.lax.fori_loop(0, nchunks, body, jnp.zeros((U, V), jnp.float32))
        out_ref[0, 0, :, :] = acc


def _run_hist(meta, startuv, su, sv, delta, budget, G, S, U, V, interpret=False):
    return pl.pallas_call(
        _hist_kernel,
        grid=(G, S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, U, V), lambda g, s: (g, s, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, S, U, V), jnp.float32),
        interpret=interpret,
    )(meta, startuv, su, sv, delta, budget)


def _axis_uv(dom: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Non-dominant (u, v) axis ids per ray: x-dom→(y,z), y-dom→(x,z), z-dom→(x,y)."""
    u = jnp.where(dom == 0, 1, 0)
    v = jnp.where(dom == 2, 1, 2)
    return u, v


def ray_pass_counts_matmul(
    cfg: GvomConfig,
    points: jnp.ndarray,
    keep: jnp.ndarray,
    ego_position: jnp.ndarray,
    origin: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    X, Y, Z = cfg.grid_shape
    S = cfg.ray_steps
    start, step, delta, budget, dom = raycast_mod.ray_geometry(cfg, points, keep, ego_position)
    start_rel = start - origin.astype(jnp.float32)
    n = points.shape[0]

    sign_neg = jnp.take_along_axis(step, dom[:, None], axis=1)[:, 0] < 0
    group = dom * 2 + sign_neg.astype(jnp.int32)          # 0..5
    uax, vax = _axis_uv(dom)
    su = jnp.take_along_axis(step, uax[:, None], axis=1)[:, 0]
    sv = jnp.take_along_axis(step, vax[:, None], axis=1)[:, 0]

    # upper bound on steps taken: (k-1)*delta < budget ⇒ k ≤ floor(budget/delta)+1
    kmax = jnp.where(
        budget >= 0,
        jnp.minimum(jnp.floor(budget / jnp.maximum(delta, 1e-20)).astype(jnp.int32) + 1, S),
        0,
    )

    # sort rays by (group, descending kmax) so live rays at step s are a prefix
    key = group * (S + 2) + (S + 1 - kmax)
    key_s, su_s, sv_s, delta_s, budget_s, kmax_s, group_s = jax.lax.sort(
        (key, su, sv, delta, budget, kmax, group), num_keys=1
    )

    # pad so any in-range chunk read stays in bounds; padded rays are dead
    npad = ((n + _CHUNK - 1) // _CHUNK + 1) * _CHUNK
    pad = npad - n
    su_s = jnp.pad(su_s, (0, pad))
    sv_s = jnp.pad(sv_s, (0, pad))
    delta_s = jnp.pad(delta_s, (0, pad))
    budget_s = jnp.pad(budget_s, (0, pad), constant_values=-1.0)

    # per-group sizes and per-(group, step) live counts via small matmul hists
    ohg = (group_s[:, None] == jnp.arange(6)[None, :]).astype(jnp.bfloat16)
    ohk = (kmax_s[:, None] == jnp.arange(S + 1)[None, :]).astype(jnp.bfloat16)
    alive_mask = (kmax_s > 0).astype(jnp.bfloat16)
    cnt_gk = jax.lax.dot_general(
        ohg * alive_mask[:, None], ohk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32)                                    # [6, S+1] rays per (group, kmax)
    live_gs = jnp.flip(jnp.cumsum(jnp.flip(cnt_gk, axis=1), axis=1), axis=1)  # rays with kmax >= s
    sizes = jax.lax.dot_general(
        ohg, jnp.ones((n, 1), jnp.bfloat16), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[:, 0].astype(jnp.int32)                              # [6] all rays per group (incl dead)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)[:-1]])

    # dominant-axis cell rows per (group, step): same f32 expression as the
    # XLA fallback — floor(start_rel_dom + s*(±1))
    s_ar = jnp.arange(1, S + 1, dtype=jnp.float32)
    dom_axis = jnp.array([0, 0, 1, 1, 2, 2])
    dom_sign = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0], jnp.float32)
    dom_size = jnp.array([X, X, Y, Y, Z, Z])
    rows = jnp.floor(start_rel[dom_axis][:, None] + dom_sign[:, None] * s_ar[None, :]).astype(jnp.int32)
    rows_ok = (rows >= 0) & (rows < dom_size[:, None])     # [6, S]

    startuv = jnp.stack(
        [
            jnp.stack([start_rel[1], start_rel[2]]),  # x+ : (y, z)
            jnp.stack([start_rel[1], start_rel[2]]),  # x-
            jnp.stack([start_rel[0], start_rel[2]]),  # y+ : (x, z)
            jnp.stack([start_rel[0], start_rel[2]]),  # y-
            jnp.stack([start_rel[0], start_rel[1]]),  # z+ : (x, y)
            jnp.stack([start_rel[0], start_rel[1]]),  # z-
        ],
        axis=0,
    )

    def build_meta(groups):
        m = []
        for g in groups:
            off = jnp.broadcast_to(offsets[g], (S,))
            cnts = live_gs[g, 1:]                        # live rays at step s (s=1..S)
            abase = (off // _CHUNK) * _CHUNK             # aligned window start
            nchunks = (off + cnts - abase + _CHUNK - 1) // _CHUNK
            ok = rows_ok[g].astype(jnp.int32)
            m.append(jnp.stack([abase, nchunks, off, cnts, ok], axis=1))
        meta = jnp.stack(m, axis=0)                       # [G, S, 5]
        # kernel indexes meta[g, s] with s 1-based → prepend a dummy row
        return jnp.concatenate([jnp.zeros((len(groups), 1, 5), jnp.int32), meta], axis=1)

    # --- xy-dominant kernel: groups 0..3, hist over (u∈[0,256), v=z) ---
    meta_xy = build_meta([0, 1, 2, 3])
    hist_xy = _run_hist(meta_xy, startuv[:4], su_s, sv_s, delta_s, budget_s, 4, S, X, Z, interpret)

    # --- z-dominant kernel: groups 4..5, hist over (x, y) ---
    meta_z = build_meta([4, 5])
    Sz = min(S, Z + 2)
    hist_z = _run_hist(meta_z[:, : Sz + 1], startuv[4:], su_s, sv_s, delta_s, budget_s, 2, Sz, X, Y, interpret)

    # --- placement: one-hot matmul over the step axis (exact, no scatter) ---
    out = jnp.zeros((X, Y, Z), jnp.float32)
    # groups 0,1: rows are x cells; hist [S, Y(=256 via U=X? u-axis is y), Z]
    #   u-axis for x-dom is y (size Y) — U was passed as X==Y for xy grids
    for gi, g in enumerate((0, 1)):
        oh = ((rows[g][None, :] == jnp.arange(X)[:, None]) & rows_ok[g][None, :]).astype(jnp.float32)
        h = hist_xy[gi].reshape(S, Y * Z)
        out = out + jax.lax.dot_general(
            oh, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(X, Y, Z)
    for gi, g in enumerate((2, 3)):
        oh = ((rows[g][None, :] == jnp.arange(Y)[:, None]) & rows_ok[g][None, :]).astype(jnp.float32)
        h = hist_xy[2 + gi].reshape(S, X * Z)
        contrib = jax.lax.dot_general(
            oh, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(Y, X, Z)
        out = out + contrib.transpose(1, 0, 2)
    for gi, g in enumerate((4, 5)):
        oh = ((rows[g][None, :Sz] == jnp.arange(Z)[:, None]) & rows_ok[g][None, :Sz]).astype(jnp.float32)
        h = hist_z[gi].reshape(Sz, X * Y)
        contrib = jax.lax.dot_general(
            oh, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(Z, X, Y)
        out = out + contrib.transpose(1, 2, 0)
    return out.astype(jnp.int32)
