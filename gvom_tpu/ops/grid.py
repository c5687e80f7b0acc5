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
    "shift_align_grid",
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


def shift_align_grid(grid, d: jnp.ndarray):
    """Align a VoxelGrid's arrays to a frame offset by d = dst_origin − src_origin.

    Means are kept in map-local voxel units, so the shift also subtracts d from
    them (translation; M2 is translation-invariant). Returns a new VoxelGrid
    whose origin equals src.origin + d.
    """
    from gvom_tpu.types import VoxelGrid

    mean_shifted = shift_align(grid.mean, d, 0.0) - d.astype(jnp.float32)[:, None, None, None]
    n_shifted = shift_align(grid.n, d, 0.0)
    # keep means zero where no data so fill regions stay inert
    mean_shifted = jnp.where(n_shifted > 0, mean_shifted, 0.0)
    return VoxelGrid(
        hit=shift_align(grid.hit, d, 0),
        miss=shift_align(grid.miss, d, 0),
        evidence=shift_align(grid.evidence, d, 0),
        min_height=shift_align(grid.min_height, d, 1.0),
        n=n_shifted,
        mean=mean_shifted,
        m2=shift_align(grid.m2, d, 0.0),
        origin=grid.origin + d,
    )
