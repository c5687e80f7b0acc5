"""shard_map pipelines: batched scan replay over a (data, space) mesh.

BASELINE configs #4/#5: a batch of (scan, ego) pairs per step, data-sharded;
the world grid y-axis sharded over `space`. Per step each device rasterizes
its scan shard into a common map frame (per-voxel accumulators are
associative — SURVEY.md §2.3), contributions are psum'd over `data`, the
world state (held as y-shards) is re-origined and merged, and the 2D map
products are derived.

Round-1 collective layout (honest about its costs): psum over data, world
re-origin via all_gather over space + local shift + re-slice (the y-shift
crosses shard boundaries; a ppermute halo pipeline replaces this in the
optimization roadmap — the stencil radii are bounded, see ops/maps2d).

Batched semantics vs the reference: all scans of a batch rasterize into one
common frame and fuse associatively (order-free), rather than the reference's
slot-ordered ring buffer — the ring buffer exists to decouple sensor threads
from the combine timer (gvom.py:163-175), which a batched step subsumes.
Negative evidence uses the associative form (misses at unoccupied voxels).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gvom_tpu.config import GvomConfig
from gvom_tpu.models import pipeline
from gvom_tpu.ops import grid as gridops
from gvom_tpu.ops import maps2d, moments
from gvom_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS
from gvom_tpu.types import MapProducts, VoxelGrid, WorldState

__all__ = ["world_pspecs", "batched_step", "make_batched_step"]


def world_pspecs() -> WorldState:
    """PartitionSpecs for WorldState: grid y-axis sharded over `space`."""
    g = VoxelGrid(
        hit=P(None, SPACE_AXIS, None),
        miss=P(None, SPACE_AXIS, None),
        evidence=P(None, SPACE_AXIS, None),
        min_height=P(None, SPACE_AXIS, None),
        mom=P(None, None, SPACE_AXIS, None),   # [X, 7, Y, Vp]: y is dim 2
        origin=P(),
    )
    return WorldState(grid=g, valid=P())


def _merge_scan_grids(a: VoxelGrid, b: VoxelGrid) -> VoxelGrid:
    """Associative merge of two same-origin scan contributions.

    Moment channels are raw voxel-local sums (ops/moments) — plain adds."""
    return VoxelGrid(
        hit=a.hit + b.hit,
        miss=a.miss + b.miss,
        evidence=a.evidence + b.evidence,
        min_height=jnp.minimum(a.min_height, b.min_height),
        mom=a.mom + b.mom,
        origin=a.origin,
    )


def make_batched_step(cfg: GvomConfig, mesh: Mesh, raycast_impl: str = "auto"):
    """Build the jitted sharded step:
    (world, scans [S,N,3], valid [S,N], egos [S,3]) → (world, products)."""

    wspec = world_pspecs()

    def device_fn(world: WorldState, scans, valid, egos):
        # ---- common frame: origin of the batch's last scan (globally) ----
        egos_all = jax.lax.all_gather(egos, DATA_AXIS, tiled=True)     # [S_total, 3]
        ego_last = egos_all[-1]
        origin = gridops.compute_origin(cfg, ego_last)

        # ---- data-parallel ingest into the common frame ----
        def ingest_one(carry, xs):
            pts, vmask, ego = xs
            g, ok = pipeline.ingest_scan(
                cfg, pts, vmask, ego, None, raycast_impl, origin=origin
            )
            dead = ~ok
            g = jax.tree_util.tree_map(lambda l: jnp.where(dead, jnp.zeros_like(l), l), g)
            g = g._replace(origin=origin, min_height=jnp.where(dead, jnp.ones_like(g.min_height), g.min_height))
            return _merge_scan_grids(carry, g), ok

        from gvom_tpu.types import empty_voxel_grid

        init = empty_voxel_grid(cfg)._replace(origin=origin)
        local, oks = jax.lax.scan(ingest_one, init, (scans, valid, egos))

        # ---- reduce scan contributions across the data axis ----
        # raw voxel-local moment sums psum exactly (ops/moments)
        minh = -jax.lax.pmax(-local.min_height, DATA_AXIS)   # min via -max(-x)
        contrib = VoxelGrid(
            hit=jax.lax.psum(local.hit, DATA_AXIS),
            miss=jax.lax.psum(local.miss, DATA_AXIS),
            evidence=jax.lax.psum(local.evidence, DATA_AXIS),
            min_height=minh,
            mom=jax.lax.psum(local.mom, DATA_AXIS),
            origin=origin,
        )

        # ---- merge with the world (y-sharded): gather, shift, merge, slice ----
        wg_local = world.grid
        wg_full = jax.tree_util.tree_map(
            lambda l, spec: _gather_space(l, spec), wg_local, wspec.grid
        )
        wg_full = wg_full._replace(origin=wg_local.origin)
        old = gridops.align_to(cfg, wg_full, origin)
        old_valid = world.valid

        occ = contrib.hit > 0
        old_occ = (old.hit > 0) & old_valid
        revive = old_occ & ~occ & (contrib.evidence <= cfg.decay_miss_limit)
        occ2 = occ | revive
        evidence = jnp.where(
            ~old_occ & (old.evidence > 0) & ~occ2 & old_valid,
            contrib.evidence + old.evidence,
            contrib.evidence,
        )
        msel = old_occ & occ2
        mpk = moments.packed_voxel_mask(msel, cfg.z_size)
        merged = VoxelGrid(
            hit=contrib.hit + jnp.where(msel, old.hit, 0),
            miss=contrib.miss + jnp.where(msel, old.miss, 0),
            evidence=evidence,
            min_height=jnp.where(msel, jnp.minimum(contrib.min_height, old.min_height), contrib.min_height),
            mom=contrib.mom + jnp.where(mpk[:, None], old.mom, 0.0),
            origin=origin,
        )

        # ---- 2D products (replicated compute on the full grid, v1) ----
        hm_t = maps2d.height_map(cfg, occ2, merged.min_height, origin, ego_last)
        ihm_t = maps2d.inferred_height_map(cfg, occ2, evidence, origin)
        hm = gridops.torus_to_window(hm_t, origin, grid_ndim=2)
        ihm = gridops.torus_to_window(ihm_t, origin, grid_ndim=2)
        sx, sy, rough = maps2d.slope_and_roughness(cfg, hm)
        ghd = maps2d.guess_height_delta(cfg, hm, ihm)
        sx_t = gridops.window_to_torus(sx, origin, grid_ndim=2)
        sy_t = gridops.window_to_torus(sy, origin, grid_ndim=2)
        pos_t = maps2d.positive_obstacle_map(
            cfg, occ2, merged.hit, merged.hit + merged.miss, hm_t, sx_t, sy_t, origin
        )
        pos = gridops.torus_to_window(pos_t, origin, grid_ndim=2)
        neg = maps2d.negative_obstacle_map(cfg, ghd)
        vis = maps2d.visibility_map(hm)
        products = MapProducts(
            origin=origin, height=hm, inferred_height=ihm, slope_x=sx, slope_y=sy,
            roughness=rough, guessed_height_delta=ghd, positive_obstacle=pos,
            negative_obstacle=neg, visibility=vis,
        )

        # ---- keep only this device's y-shard of the new world ----
        new_local = jax.tree_util.tree_map(
            lambda l, spec: _slice_space(l, spec), merged, wspec.grid
        )
        new_world = WorldState(grid=new_local._replace(origin=origin), valid=jnp.asarray(True))
        return new_world, products

    def _gather_space(leaf, spec):
        if spec == P():
            return leaf
        axis = list(spec).index(SPACE_AXIS)
        return jax.lax.all_gather(leaf, SPACE_AXIS, axis=axis, tiled=True)

    def _slice_space(leaf, spec):
        if spec == P():
            return leaf
        axis = list(spec).index(SPACE_AXIS)
        nsp = jax.lax.psum(1, SPACE_AXIS)
        idx = jax.lax.axis_index(SPACE_AXIS)
        size = leaf.shape[axis] // nsp
        return jax.lax.dynamic_slice_in_dim(leaf, idx * size, size, axis=axis)

    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(
            world_pspecs(),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None),
            P(DATA_AXIS, None),
        ),
        out_specs=(world_pspecs(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def batched_step(cfg: GvomConfig, mesh: Mesh, world, scans, valid, egos, raycast_impl: str = "auto"):
    return make_batched_step(cfg, mesh, raycast_impl)(world, scans, valid, egos)
