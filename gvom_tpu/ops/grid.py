"""Grid geometry: origins, voxel indexing, dynamic re-origin shifts.

The reference's ego-centered scrolling-window convention (gvom.py:123-126):
origin = floor(ego/res − size/2) per axis, in voxel units; maps with different
origins align by integer offset d = dst_origin − src_origin (gvom.py:829-839).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig

__all__ = [
    "compute_origin",
    "resolution_vector",
    "size_vector",
    "voxel_indices",
    "in_bounds",
    "shift_align",
    "rel_coords",
    "overlap_mask",
    "align_to",
    "window_to_torus",
    "torus_to_window",
]


def resolution_vector(cfg: GvomConfig) -> jnp.ndarray:
    return jnp.array([cfg.xy_resolution, cfg.xy_resolution, cfg.z_resolution], jnp.float32)


def size_vector(cfg: GvomConfig) -> jnp.ndarray:
    return jnp.array([cfg.xy_size, cfg.xy_size, cfg.z_size], jnp.int32)


def compute_origin(cfg: GvomConfig, ego_position: jnp.ndarray) -> jnp.ndarray:
    """Grid origin in voxel units (gvom.py:123-126)."""
    res = resolution_vector(cfg)
    half = jnp.array([cfg.xy_size / 2.0, cfg.xy_size / 2.0, cfg.z_size / 2.0], jnp.float32)
    return jnp.floor(ego_position.astype(jnp.float32) / res - half).astype(jnp.int32)


def voxel_indices(cfg: GvomConfig, points: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
    """[N,3] int32 voxel coordinates of world points (may be out of bounds)."""
    res = resolution_vector(cfg)
    return jnp.floor(points.astype(jnp.float32) / res - origin.astype(jnp.float32)).astype(jnp.int32)


def in_bounds(cfg: GvomConfig, vox: jnp.ndarray) -> jnp.ndarray:
    size = size_vector(cfg)
    return jnp.all((vox >= 0) & (vox < size), axis=-1)


@partial(jax.jit, static_argnames=("fill",), donate_argnums=())
def _shift3(arr: jnp.ndarray, d: jnp.ndarray, fill: float) -> jnp.ndarray:
    out = arr
    for ax in range(3):
        axis = out.ndim - 3 + ax
        s = out.shape[axis]
        out = jnp.roll(out, -d[ax], axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, out.shape, axis)
        valid = (idx + d[ax] >= 0) & (idx + d[ax] < s)
        out = jnp.where(valid, out, jnp.asarray(fill, out.dtype))
    return out


def shift_align(arr: jnp.ndarray, d: jnp.ndarray, fill=0) -> jnp.ndarray:
    """aligned[v] = arr[v + d] with `fill` outside the source extent.

    Works on [..., X, Y, Z] (trailing grid dims); d is a traced [3] int32.
    """
    return _shift3(arr, d, float(fill))


# ----------------------------------------------------------------------
# Torus (mod-size) storage layout
#
# Grid arrays store world voxel w at array index w mod size — the scrolling
# ego window then never moves data: re-origining a map is a re-interpretation
# plus cheap per-axis masks, instead of the reference's integer copy shifts
# (gvom.py:829-839) which cost a full multi-hundred-MB pass per map on TPU.
# `rel = (index − origin) mod size` recovers the window-relative coordinate;
# window-relative ("canonical") layouts are only materialized for the small
# 2D products and host exports.


def rel_coords(cfg: GvomConfig, origin: jnp.ndarray):
    """Per-axis window-relative coordinate of each array index: [X],[Y],[Z]."""
    out = []
    for ax, size in enumerate(cfg.grid_shape):
        i = jnp.arange(size, dtype=jnp.int32)
        out.append((i - origin[ax]) % size)
    return tuple(out)


def overlap_mask(cfg: GvomConfig, o_target: jnp.ndarray, o_source: jnp.ndarray, coords=None) -> jnp.ndarray:
    """[X,Y,Z] bool: array cells where source's stored world voxel equals the
    target window's world voxel (the two windows' overlap, in torus indices).

    `coords` optionally gives the global torus indices covered along each axis
    (3-tuple of int arrays; default the full 0..size-1 range) — a spatially
    sharded caller passes its slab's global indices so the mask stays pure
    iota arithmetic on the shard (parallel/sharding.py)."""
    masks = []
    for ax, size in enumerate(cfg.grid_shape):
        i = coords[ax] if coords is not None else jnp.arange(size, dtype=jnp.int32)
        rel_t = (i - o_target[ax]) % size
        d = o_target[ax] - o_source[ax]
        ok = (rel_t >= -jnp.minimum(d, 0)) & (rel_t < size - jnp.maximum(d, 0))
        masks.append(ok)
    return masks[0][:, None, None] & masks[1][None, :, None] & masks[2][None, None, :]


def align_to(cfg: GvomConfig, grid, new_origin: jnp.ndarray, coords=None):
    """Re-origin a torus grid: pure masks — no data movement.

    Raw voxel-local moment sums are frame-invariant, so the packed moment
    array is masked in place (lane-packed mask) like every other channel.
    `coords` as in overlap_mask (sharded grids)."""
    from gvom_tpu.ops.moments import packed_voxel_mask
    from gvom_tpu.types import VoxelGrid

    mask = overlap_mask(cfg, new_origin, grid.origin, coords)
    mpk = packed_voxel_mask(mask, cfg.z_size)
    return VoxelGrid(
        hit=jnp.where(mask, grid.hit, 0),
        miss=jnp.where(mask, grid.miss, 0),
        min_height=jnp.where(mask, grid.min_height, 1.0),
        mom=jnp.where(mpk[:, None], grid.mom, 0.0),
        origin=new_origin,
    )


def window_to_torus(arr: jnp.ndarray, origin: jnp.ndarray, grid_ndim: int = 3) -> jnp.ndarray:
    """Move a window-relative array (row 0 = window start) into torus layout.

    torus[(r + o) mod size] = window[r]; rolls the trailing `grid_ndim` axes.
    """
    for k in range(grid_ndim):
        ax = arr.ndim - grid_ndim + k
        arr = jnp.roll(arr, origin[k] % arr.shape[ax], axis=ax)
    return arr


def torus_to_window(arr: jnp.ndarray, origin: jnp.ndarray, grid_ndim: int = 3) -> jnp.ndarray:
    """Inverse of window_to_torus."""
    for k in range(grid_ndim):
        ax = arr.ndim - grid_ndim + k
        arr = jnp.roll(arr, -(origin[k] % arr.shape[ax]), axis=ax)
    return arr


