"""Point → voxel accumulation (the reference's K4 endpoint binning
gvom.py:1084-1090, K12 min-height gvom.py:1301-1329, and the per-voxel raw
stage of the metrics pipeline gvom.py:1170-1299).

TPU-native design: no atomics. The XLA path uses deterministic scatter-adds
(fine on CPU test meshes, adequate single-scan on TPU); the hot path is
replaced by sort+segment / matmul-histogram kernels via the registry. All
outputs are dense grids.

Moments leave here as *own-voxel raw sums* in the voxel's local frame
(gvom.py:1205-1207): n0 (points inside the voxel only), S1 = Σ(p − v),
R2 = Σ(p − v)(p − v)ᵀ — no normalization, no centering; see ops/moments for
why raw sums. They are accumulated on a grid padded by the eigen support
radius because the reference expands each point into neighbors without
checking the point's own voxel bounds (gvom.py:1184-1202) — border-external
points legitimately feed border voxels. Neighborhood expansion itself is a
separable shift+translate box filter in ops.moments.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops import grid as gridops

__all__ = ["PointBins", "prepare_points", "bin_points", "moment_pad", "slab_point_moments"]

_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def moment_pad(cfg: GvomConfig) -> Tuple[int, int, int]:
    return (cfg.xy_eigen_dist, cfg.xy_eigen_dist, cfg.z_eigen_dist)


class PointBins(NamedTuple):
    hit: jnp.ndarray          # [X,Y,Z] int32
    min_height: jnp.ndarray   # [X,Y,Z] f32 (init 1.0; sub-voxel z of lowest point)
    n0: jnp.ndarray           # [X+2rx,Y+2rx,Z+2rz] f32 — per-voxel own point count (padded)
    s1: jnp.ndarray           # [3, padded...] f32 — Σ(p − v), own-voxel-local raw first moments
    s2: jnp.ndarray           # [6, padded...] f32 — Σ(p−v)(p−v)ᵀ raw second moments (xx,xy,xz,yy,yz,zz)


def prepare_points(
    cfg: GvomConfig,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    ego_position: jnp.ndarray,
    transform: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transform (gvom.py:1038-1056) + min-distance filter (gvom.py:1064-1068).

    The distance filter uses the post-transform world-frame norm — the
    reference quirk — unless cfg.ego_relative_min_distance.
    """
    p = points.astype(jnp.float32)
    if transform is not None:
        t = transform.astype(jnp.float32)
        p = p @ t[:3, :3].T + t[:3, 3]
    if cfg.ego_relative_min_distance:
        rel = p - ego_position.astype(jnp.float32)
        d2 = jnp.sum(rel * rel, axis=1)
    else:
        d2 = jnp.sum(p * p, axis=1)
    keep = valid & (d2 >= jnp.float32(cfg.min_distance) ** 2)
    return p, keep


def bin_points(
    cfg: GvomConfig,
    points: jnp.ndarray,
    keep: jnp.ndarray,
    origin: jnp.ndarray,
) -> PointBins:
    """Deterministic dense binning of one scan's endpoints."""
    shape = cfg.grid_shape
    res = gridops.resolution_vector(cfg)
    pn = points / res - origin.astype(jnp.float32)       # map-local voxel units
    vox = jnp.floor(pn).astype(jnp.int32)
    local = pn - vox.astype(jnp.float32)                 # sub-voxel coords in [0,1)

    # ---- endpoint hit counts + min height (in-bounds points; torus layout) ----
    size = gridops.size_vector(cfg)
    inb = keep & gridops.in_bounds(cfg, vox)
    vt = (vox + origin[None, :]) % size[None, :]
    vc = jnp.where(inb[:, None], vt, 0)
    ix, iy, iz = vc[:, 0], vc[:, 1], vc[:, 2]
    hit = jnp.zeros(shape, jnp.int32).at[ix, iy, iz].add(inb.astype(jnp.int32))
    mh = jnp.ones(shape, jnp.float32).at[ix, iy, iz].min(jnp.where(inb, local[:, 2], 1.0))

    # ---- own-voxel raw moments on the padded grid ----
    pad = jnp.array(moment_pad(cfg), jnp.int32)
    pshape = tuple(s + 2 * int(p) for s, p in zip(shape, moment_pad(cfg)))
    vp = vox + pad[None, :]
    inp = keep & jnp.all((vp >= 0) & (vp < jnp.array(pshape, jnp.int32)), axis=1)
    vpc = jnp.where(inp[:, None], vp, 0)
    px, py, pz = vpc[:, 0], vpc[:, 1], vpc[:, 2]
    w = inp.astype(jnp.float32)

    s0 = jnp.zeros(pshape, jnp.float32).at[px, py, pz].add(w)
    s1 = jnp.zeros((3,) + pshape, jnp.float32).at[:, px, py, pz].add(jnp.where(inp, local.T, 0.0))
    prods = jnp.stack([local[:, i] * local[:, j] for i, j in _PAIRS], axis=0)   # [6,N]
    s2 = jnp.zeros((6,) + pshape, jnp.float32).at[:, px, py, pz].add(jnp.where(inp[None, :], prods, 0.0))
    return PointBins(hit=hit, min_height=mh, n0=s0, s1=s1, s2=s2)


def slab_point_moments(
    cfg: GvomConfig,
    points: jnp.ndarray,
    keep: jnp.ndarray,
    origin: jnp.ndarray,
    ys0: jnp.ndarray,
    Ys: int,
    occupancy_mask: bool = True,
):
    """Slab-restricted ingest accumulation for the spatially sharded step:
    (hit [X,Ys,Z] i32, min_height [X,Ys,Z] f32, mom [X,5,Ys,Vp] f32) for the
    torus y-slab [ys0, ys0+Ys) only — no full-width-y intermediate is ever
    materialized, so per-device ingest memory scales 1/n_space.

    Semantics match bin_points + moments.box_aggregate_moments +
    pack_moments restricted to the slab's columns: the ±ry y-neighborhood is
    applied at scatter time (each point feeds its 2ry+1 y-target rows with
    target-local translated coordinates — the reference's own expansion,
    gvom.py:1188-1202, so window-edge clipping is exact); the x/z boxes stay
    shift+translate filters on the x/z-padded slab. Portable XLA path (the
    CPU mesh runs it); the single-device TPU path keeps the fused Pallas
    kernel.
    """
    from gvom_tpu.ops import moments as moments_mod

    X, Y, Z = cfg.grid_shape
    rx, ry, rz = moment_pad(cfg)
    res = gridops.resolution_vector(cfg)
    pn = points / res - origin.astype(jnp.float32)
    vox = jnp.floor(pn).astype(jnp.int32)
    local = pn - vox.astype(jnp.float32)
    size = gridops.size_vector(cfg)

    # ---- endpoint hits + min height: torus x/z, slab y ----
    inb = keep & gridops.in_bounds(cfg, vox)
    vt = (vox + origin[None, :]) % size[None, :]
    yloc = vt[:, 1] - ys0
    sel = inb & (yloc >= 0) & (yloc < Ys)
    ix = jnp.where(sel, vt[:, 0], 0)
    iy = jnp.where(sel, yloc, 0)
    iz = jnp.where(sel, vt[:, 2], 0)
    hit = jnp.zeros((X, Ys, Z), jnp.int32).at[ix, iy, iz].add(sel.astype(jnp.int32))
    mh = jnp.ones((X, Ys, Z), jnp.float32).at[ix, iy, iz].min(jnp.where(sel, local[:, 2], 1.0))

    # ---- raw moments: y expanded at scatter time, x/z padded-window ----
    Xp, Zp = X + 2 * rx, Z + 2 * rz
    pshape = (Xp, Ys, Zp)
    px_w = vox[:, 0] + rx
    pz_w = vox[:, 2] + rz
    src_ok = keep & (px_w >= 0) & (px_w < Xp) & (pz_w >= 0) & (pz_w < Zp)
    n0 = jnp.zeros(pshape, jnp.float32)
    s1 = jnp.zeros((3,) + pshape, jnp.float32)
    s2 = jnp.zeros((6,) + pshape, jnp.float32)
    for off in range(-ry, ry + 1):
        ty_win = vox[:, 1] + off                 # y target, window coords
        trow = (ty_win + origin[1]) % Y - ys0    # slab row of the target
        ok = src_ok & (ty_win >= 0) & (ty_win < Y) & (trow >= 0) & (trow < Ys)
        sx = jnp.where(ok, px_w, 0)
        sy = jnp.where(ok, trow, 0)
        sz = jnp.where(ok, pz_w, 0)
        ly = local[:, 1] - off                   # target-local y coordinate
        lt = jnp.stack([local[:, 0], ly, local[:, 2]], axis=1)
        w = ok.astype(jnp.float32)
        n0 = n0.at[sx, sy, sz].add(w)
        s1 = s1.at[:, sx, sy, sz].add(jnp.where(ok, lt.T, 0.0))
        prods = jnp.stack([lt[:, i] * lt[:, j] for i, j in _PAIRS], axis=0)
        s2 = s2.at[:, sx, sy, sz].add(jnp.where(ok[None, :], prods, 0.0))

    # x / z boxes: shift + translate on the padded slab (window semantics —
    # the pad rows carry out-of-window sources, zeros flow in at the edges)
    for arr_ax, coord_ax, r in ((0, 0, rx), (2, 2, rz)):
        if r == 0:
            continue
        acc_n, acc_s1, acc_s2 = n0, s1, s2
        for off in range(-r, r + 1):
            if off == 0:
                continue
            sn = moments_mod._shifted(n0, off, arr_ax)
            ts1, ts2 = moments_mod.translate_raw(
                sn,
                moments_mod._shifted(s1, off, arr_ax + 1),
                moments_mod._shifted(s2, off, arr_ax + 1),
                coord_ax,
                float(off),
            )
            acc_n = acc_n + sn
            acc_s1 = acc_s1 + ts1
            acc_s2 = acc_s2 + ts2
        n0, s1, s2 = acc_n, acc_s1, acc_s2
    slx = slice(rx, rx + X)
    slz = slice(rz, rz + Z)
    n0 = n0[slx, :, slz]
    s1 = s1[:, slx, :, slz]
    s2 = s2[:, slx, :, slz]
    # x/z were window coords → torus; y is already slab (torus-contiguous)
    rollx, rollz = origin[0] % X, origin[2] % Z
    n0 = jnp.roll(jnp.roll(n0, rollx, axis=0), rollz, axis=2)
    s1 = jnp.roll(jnp.roll(s1, rollx, axis=1), rollz, axis=3)
    s2 = jnp.roll(jnp.roll(s2, rollx, axis=1), rollz, axis=3)
    mom = moments_mod.pack_moments(n0, s1, s2)
    if occupancy_mask:
        # occupancy pre-mask (r5) — see pipeline.ingest_scan / the Pallas
        # epilogue note: consumers read moments only under hit > 0. The
        # batched merged-points path passes False and applies the GLOBAL
        # batch occupancy after the data psum (mesh-shape invariant).
        mom = jnp.where(moments_mod.packed_voxel_mask(hit > 0, Z)[:, None], mom, 0.0)
    return hit, mh, mom
