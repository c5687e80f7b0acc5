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
    "overlap_mask_packed",
    "pack_yz",
    "unpack_yz",
    "packed_z_coord",
    "expand_cols_packed",
    "reduce_z_packed",
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


# ----------------------------------------------------------------------
# Lane-dense ("y-paired") channel storage
#
# A [X, Y, Z] i32/f32 array with Z = 64 occupies TPU T(8, 128) tiles at HALF
# lane utilization (the minor dim pads 64 → 128): 2× the HBM footprint, DMA
# traffic, and VPU work of its logical size — measured as the blocker for the
# r4 mega-combine kernel (BENCHMARKS.md). All hot grid channels (hit, miss,
# min_height, evidence) are therefore STORED as the contiguous reshape
# [X, Y/2, 2Z] — lanes = [z of even y | z of odd y] — which is
# semantics-preserving (same element order), so every elementwise op
# (merges, masks, psums) runs on the packed form unchanged. Only mask
# construction and per-column z reductions need packed-aware forms (below
# and ops/maps2d); cold consumers unpack via the VoxelGrid properties.
# The pack factor is FIXED at 2 (xy_size must be even) so shapes are
# self-describing; Z ≥ 64 is thus always lane-dense.


def pack_yz(arr: jnp.ndarray) -> jnp.ndarray:
    """[..., Y, Z] → [..., Y/2, 2Z] (contiguous reshape; Y must be even)."""
    *lead, Y, Z = arr.shape
    return arr.reshape(*lead, Y // 2, 2 * Z)


def unpack_yz(arr: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_yz: [..., Y/2, 2Z] → [..., Y, Z]."""
    *lead, R, L = arr.shape
    return arr.reshape(*lead, 2 * R, L // 2)


def packed_z_coord(z_size: int) -> jnp.ndarray:
    """[2Z] int32: the z coordinate of each packed lane (l mod Z)."""
    return jnp.tile(jnp.arange(z_size, dtype=jnp.int32), 2)


def expand_cols_packed(v: jnp.ndarray, z_size: int) -> jnp.ndarray:
    """Per-column 2D values [..., X, Y] → packed per-voxel [..., X, Y/2, 2Z]
    by broadcasting each column's value over its z lane-segment. Pure
    broadcast+concat — fuses, never materializes a [X, Y, Z] intermediate."""
    *lead, X, Y = v.shape
    v3 = v.reshape(*lead, X, Y // 2, 2)
    tgt = tuple(lead) + (X, Y // 2, z_size)
    lo = jnp.broadcast_to(v3[..., 0:1], tgt)
    hi = jnp.broadcast_to(v3[..., 1:2], tgt)
    return jnp.concatenate([lo, hi], axis=-1)


def reduce_z_packed(arr: jnp.ndarray, op: str) -> jnp.ndarray:
    """Per-column z reduction of a packed array [..., X, Y/2, 2Z] → [..., X, Y].
    Two lane-half reductions + an interleave reshape (no [X, Y, Z]
    intermediate). op ∈ {'min', 'max', 'sum'}."""
    *lead, X, R, L = arr.shape
    Z = L // 2
    fn = {"min": jnp.min, "max": jnp.max, "sum": jnp.sum}[op]
    lo = fn(arr[..., :Z], axis=-1)
    hi = fn(arr[..., Z:], axis=-1)
    return jnp.stack([lo, hi], axis=-1).reshape(*lead, X, 2 * R)


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


def overlap_mask_packed(cfg: GvomConfig, o_target: jnp.ndarray, o_source: jnp.ndarray, coords=None) -> jnp.ndarray:
    """overlap_mask in the y-paired storage layout: [X, Y/2, 2Z] bool.
    Built directly from the per-axis masks (the y⊗z factor is a tiny
    [Y, Z] → [Y/2, 2Z] reshape) — no [X, Y, Z] intermediate."""
    per_axis = _overlap_axis_masks(cfg, o_target, o_source, coords)
    myz = pack_yz(per_axis[1][:, None] & per_axis[2][None, :])
    return per_axis[0][:, None, None] & myz[None]


def _overlap_axis_masks(cfg, o_target, o_source, coords=None):
    per_axis = []
    for ax, size in enumerate(cfg.grid_shape):
        i = coords[ax] if coords is not None else jnp.arange(size, dtype=jnp.int32)
        rel_t = (i - o_target[ax]) % size
        d = o_target[ax] - o_source[ax]
        per_axis.append((rel_t >= -jnp.minimum(d, 0)) & (rel_t < size - jnp.maximum(d, 0)))
    return per_axis


def align_to(cfg: GvomConfig, grid, new_origin: jnp.ndarray, coords=None):
    """Re-origin a torus grid: pure masks — no data movement.

    Raw voxel-local moment sums are frame-invariant, so the packed moment
    array is masked in place (lane-packed mask) like every other channel.
    `coords` as in overlap_mask (sharded grids)."""
    from gvom_tpu.ops.moments import packed_lanes
    from gvom_tpu.types import VoxelGrid

    per_axis = _overlap_axis_masks(cfg, new_origin, grid.origin, coords)
    mask = per_axis[0][:, None, None] & pack_yz(per_axis[1][:, None] & per_axis[2][None, :])[None]
    # mom's channel-paired lane mask ([Y, Vp]: both z halves + padding),
    # built straight from the axis factors — no unpacked intermediate
    Z = cfg.z_size
    myz = per_axis[1][:, None] & per_axis[2][None, :]
    pad = packed_lanes(Z) - 2 * Z
    parts = [myz, myz]
    if pad:
        parts.append(jnp.zeros(myz.shape[:-1] + (pad,), myz.dtype))
    mpk = per_axis[0][:, None, None] & jnp.concatenate(parts, axis=-1)[None]
    return VoxelGrid(
        hit_pk=jnp.where(mask, grid.hit_pk, 0),
        miss_pk=jnp.where(mask, grid.miss_pk, 0),
        minh_pk=jnp.where(mask, grid.minh_pk, 1.0),
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


