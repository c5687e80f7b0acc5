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
