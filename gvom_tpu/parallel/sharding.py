"""shard_map pipelines: batched scan replay over a (data, space) mesh.

BASELINE configs #4/#5: a batch of (scan, ego) pairs per step; the world
grid's y axis is sharded over `space`.

Collective layout (per step, amortized over the whole scan batch), by
ingest strategy (see make_batched_step):

  * "slab": scans shard over `data` only; each device rasterizes its scans
    directly into its y-slab (per-device ingest memory AND compute scale
    1/n_space), and the only grid collective is a `psum` of slab-sized
    arrays over `data` — zero space-axis grid traffic.
  * "scatter": scans shard over BOTH axes; each device rasterizes the full
    grid (fast Pallas kernels), then `psum_scatter` over `space` (full-grid
    traffic (nsp−1)/nsp) + `psum` over `data` on the slabs. The world state
    is never all-gathered in 3D either way.
  * world merge + decay veto: shard-local elementwise masks; the torus
    re-origin needs only each slab's GLOBAL torus y indices (iota + offset,
    ops/grid.overlap_mask(coords=...)) — no data movement, no halo.
  * 2D products: column reductions (height / inferred / positive obstacle)
    run on the y-slab; only the tiny [X, X] 2D maps are all-gathered over
    `space` for the bounded-stencil ops (slope 3×3, guess-height search —
    SURVEY.md §7 "halo width vs the 15-cell search": gathering the 2D map is
    strictly cheaper than 3D halos at reference sizes).

Batched semantics vs the reference: all scans of a batch rasterize into one
common frame and fuse associatively (order-free), rather than the reference's
slot-ordered ring buffer — the ring buffer exists to decouple sensor threads
from the combine timer (gvom.py:163-175), which a batched step subsumes.
Negative evidence uses the associative form (misses at unoccupied voxels).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gvom_tpu.config import GvomConfig
from gvom_tpu.models import pipeline
from gvom_tpu.ops import grid as gridops
from gvom_tpu.ops import maps2d, moments, raycast
from gvom_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS
from gvom_tpu.types import MapProducts, VoxelGrid, WorldState

__all__ = ["world_pspecs", "batched_step", "make_batched_step"]

_ALL_AXES = (DATA_AXIS, SPACE_AXIS)


def world_pspecs() -> WorldState:
    """PartitionSpecs for WorldState: grid y-axis sharded over `space`."""
    # scalar channels are y-paired packed [X, Y/2, 2Z] (ops/grid): dim 1 is
    # the packed y-row axis — contiguous y ranges, so sharding it over
    # `space` IS the y-slab sharding (slab width Ys must stay even)
    g = VoxelGrid(
        hit_pk=P(None, SPACE_AXIS, None),
        miss_pk=P(None, SPACE_AXIS, None),
        minh_pk=P(None, SPACE_AXIS, None),
        mom=P(None, None, SPACE_AXIS, None),   # [X, N_SLOTS=5, Y, Vp]: y is dim 2
        origin=P(),
    )
    return WorldState(grid=g, evidence_pk=P(None, SPACE_AXIS, None), valid=P())


def _merge_scan_grids(acc, contrib):
    """Associative merge of two same-origin scan contributions.

    Carries (VoxelGrid, evidence): moment channels are raw voxel-local sums
    (ops/moments) — plain adds; evidence is the batched associative form
    Σ_scans miss·(scan-locally unoccupied), which is NOT a function of the
    merged hit/miss channels, so it rides its own accumulator."""
    a, a_ev = acc
    b, b_ev = contrib
    g = VoxelGrid(
        hit_pk=a.hit_pk + b.hit_pk,
        miss_pk=a.miss_pk + b.miss_pk,
        minh_pk=jnp.minimum(a.minh_pk, b.minh_pk),
        mom=a.mom + b.mom,
        origin=a.origin,
    )
    return g, a_ev + b_ev


def _point_moments(cfg, p, keep, origin, ywin, binning_impl):
    """Endpoint metrics (hit, min_height, mom) for a flat point set — the
    batched path's merged-points call. Moments are returned RAW (no
    occupancy pre-mask); the caller masks by the batch's global occupancy
    after its data psum. Mirrors pipeline.ingest_scan's implementation
    dispatch."""
    from gvom_tpu.ops import binning

    if binning_impl != "xla":
        try:
            from gvom_tpu.ops import pallas_kernels
        except ImportError:
            pallas_kernels = None
        if pallas_kernels is not None and (
                binning_impl == "fused" or pallas_kernels.use_fast_path()):
            return pallas_kernels.fused_point_moments(
                cfg, p, keep, origin, y_window=ywin, occupancy_mask=False)
    if ywin is not None:
        return binning.slab_point_moments(cfg, p, keep, origin, ywin[0], ywin[1],
                                          occupancy_mask=False)
    bins = binning.bin_points(cfg, p, keep, origin)
    n, s1, s2 = moments.box_aggregate_moments(cfg, bins)
    mom = moments.pack_moments(
        gridops.window_to_torus(n, origin),
        gridops.window_to_torus(s1, origin),
        gridops.window_to_torus(s2, origin),
    )
    return bins.hit, bins.min_height, mom


def make_batched_step(cfg: GvomConfig, mesh: Mesh, raycast_impl: str = "auto",
                      ingest: str = "auto"):
    """Build the jitted sharded step:
    (world, scans [S,N,3], valid [S,N], egos [S,3]) → (world, products).

    Two ingest strategies (`ingest`):

      * "slab" — scans shard over `data` only (replicated across `space`);
        every device rasterizes its scans DIRECTLY into its own y-slab
        (pipeline.ingest_scan's y_window), so per-device ingest memory and
        compute scale ~1/n_space and the only grid collective is a psum of
        slab-sized arrays over `data`. Since r3 the Pallas kernels take the
        window too (slab one-hot column targets + relabeled y-dominant
        worklist + slab point prefilter), so TPU meshes stay on the fast
        path.
      * "scatter" — scans shard over BOTH axes; every device rasterizes the
        full grid, then `psum_scatter` over `space` distributes y-slabs.
        Full-grid temporaries per device and a near-constant full-grid
        communication toll (BENCHMARKS.md comm-volume table); kept for
        comparison and small meshes.
      * "auto" — "slab" (the default on every mesh since r3).

    With "slab", S must divide by mesh.shape['data']; with "scatter", by
    mesh.size. Grid y size must divide by mesh.shape['space']."""

    # Resolve "auto" kernel choices against the MESH's devices, not the
    # process default backend: a CPU dry-run mesh can coexist with a live TPU
    # default backend (single-chip plugins force jax_platforms onto
    # themselves at import), and pallas TPU kernels cannot lower for CPU
    # mesh devices.
    mesh_is_tpu = all(d.platform == "tpu" for d in mesh.devices.flat)
    if raycast_impl == "auto" and not mesh_is_tpu:
        raycast_impl = "xla"
    binning_impl = "auto" if mesh_is_tpu else "xla"

    nsp = int(mesh.shape[SPACE_AXIS])
    Y = cfg.xy_size
    if Y % nsp != 0:
        raise ValueError(f"xy_size {Y} not divisible by space axis {nsp}")
    Ys = Y // nsp
    if ingest == "auto":
        ingest = "slab"
    if ingest not in ("slab", "scatter"):
        raise ValueError(f"unknown ingest strategy {ingest!r}")
    slab = ingest == "slab"
    # All scans of a batch rasterize at the LAST scan's origin, so earlier
    # egos can sit anywhere in the grid — the centered-ego DDA budget
    # (config.ray_steps) would silently truncate their long rays. Raise it to
    # the any-in-grid bound unless the caller pinned one. The raycast
    # kernels' per-ray kmax already clips at actual grid exit, so the wider
    # static bound only admits steps that have live rays.
    if cfg.ray_steps_override is None:
        cfg = dataclasses.replace(
            cfg, ray_steps_override=max(cfg.xy_size, cfg.z_size) + 4
        )
    if Ys % 2 != 0:
        raise ValueError(f"slab width {Ys} must be even (y-paired channel storage)")
    yslab_mom = 2                     # mom [X, 5, Y, Vp]: y is dim 2

    def device_fn(world: WorldState, scans, valid, egos):
        # ---- common frame: origin of the batch's globally-last scan ----
        gather_axes = DATA_AXIS if slab else _ALL_AXES
        egos_all = jax.lax.all_gather(egos, gather_axes, tiled=True)   # [S_total, 3]
        ego_last = egos_all[-1]
        origin = gridops.compute_origin(cfg, ego_last)
        sidx = jax.lax.axis_index(SPACE_AXIS)
        ys0 = sidx * Ys
        y_coords = ys0 + jnp.arange(Ys, dtype=jnp.int32)               # global torus y
        ywin = (ys0, Ys) if (slab and nsp > 1) else None

        # ---- per-scan preparation (elementwise, vmapped over the shard) ----
        from gvom_tpu.ops import binning

        pw, keep = jax.vmap(
            lambda pts, vmask, ego: binning.prepare_points(cfg, pts, vmask, ego, None)
        )(scans, valid, egos)                                  # [S, N, 3], [S, N]
        res = gridops.resolution_vector(cfg)
        vox = jnp.floor(pw / res - origin.astype(jnp.float32)).astype(jnp.int32)
        # scan_ok ≡ "scan binned at least one in-grid endpoint" — the same
        # predicate as "produced ≥ 1 occupied voxel" (gvom.py:148-150), and
        # global by construction (the test covers the FULL grid), so no
        # space-axis collective is needed
        oks = jnp.any(keep & gridops.in_bounds(cfg, vox), axis=1)
        keep = keep & oks[:, None]            # dead scans contribute nothing

        # ---- per-scan raycast: each scan's rays share ITS ego (the one-hot
        # histogram kernels exploit the scalar ray start), so the free-space
        # pass stays a scan over the shard, accumulating only the miss
        # channel ----
        X, Z = cfg.xy_size, cfg.z_size
        Ysl = Ys if (slab and nsp > 1) else cfg.xy_size

        def ray_one(miss_acc, xs):
            p1, k1, ego1 = xs
            passes = raycast.ray_pass_counts(cfg, p1, k1, ego1, origin,
                                             impl=raycast_impl, y_window=ywin)
            return miss_acc + gridops.pack_yz(passes), None

        miss0 = jnp.zeros((X, Ysl // 2, 2 * Z), jnp.int32)
        local_miss, _ = jax.lax.scan(ray_one, miss0, (pw, keep, egos))

        # ---- merged endpoint metrics: ONE kernel pass over the whole scan
        # shard (voxelize/moments are ego-free and additive over points) —
        # r5: replaces the per-scan metrics + mom-accumulate loop, removing
        # the 0.76 ms/scan carry add and amortizing the x-box epilogue
        # across the batch. Moments come back RAW (occupancy_mask=False);
        # the GLOBAL batch occupancy mask is applied after the data psum so
        # the result is mesh-shape invariant ----
        hit, minh, mom = _point_moments(cfg, pw.reshape(-1, 3), keep.reshape(-1),
                                        origin, ywin, binning_impl)
        local = VoxelGrid(hit_pk=gridops.pack_yz(hit), miss_pk=local_miss,
                          minh_pk=gridops.pack_yz(minh), mom=mom, origin=origin)

        # ---- reduce contributions into this device's y-slab ----
        if slab:
            # each device already accumulated only its slab: one psum of
            # slab-sized arrays over `data`; no space-axis grid traffic
            # (when nsp == 1 the full grid IS the slab)
            contrib = VoxelGrid(
                hit_pk=jax.lax.psum(local.hit_pk, DATA_AXIS),
                miss_pk=jax.lax.psum(local.miss_pk, DATA_AXIS),
                minh_pk=-jax.lax.pmax(-local.minh_pk, DATA_AXIS),
                mom=jax.lax.psum(local.mom, DATA_AXIS),
                origin=origin,
            )
        else:
            # sums: scatter-reduce over space (slab-distributes the y axis),
            # then psum slab-sized arrays over data. min: allreduce the single
            # f32 channel (no min-scatter collective), then slice the slab.
            def rs(x, dim):
                x = jax.lax.psum_scatter(x, SPACE_AXIS, scatter_dimension=dim, tiled=True)
                return jax.lax.psum(x, DATA_AXIS)

            minh_full = -jax.lax.pmax(-local.minh_pk, _ALL_AXES)
            contrib = VoxelGrid(
                hit_pk=rs(local.hit_pk, 1),
                miss_pk=rs(local.miss_pk, 1),
                # packed dim 1 rows are y pairs: the slab [ys0, ys0+Ys) is
                # rows [ys0/2, ys0/2 + Ys/2)
                minh_pk=jax.lax.dynamic_slice_in_dim(minh_full, ys0 // 2, Ys // 2, axis=1),
                mom=rs(local.mom, yslab_mom),
                origin=origin,
            )

        # ---- merge with the world slab: shard-local, masks only ----
        coords = (
            jnp.arange(cfg.xy_size, dtype=jnp.int32),
            y_coords,
            jnp.arange(cfg.z_size, dtype=jnp.int32),
        )
        old = gridops.align_to(cfg, world.grid, origin, coords=coords)
        omask = gridops.overlap_mask_packed(cfg, origin, world.grid.origin, coords=coords)
        old_ev = jnp.where(omask, world.evidence_pk, 0)
        old_valid = world.valid

        occ = contrib.hit_pk > 0
        old_occ = (old.hit_pk > 0) & old_valid
        # the batch's negative evidence at any cell the fused map leaves
        # unoccupied is exactly its total miss count: per-scan occupancy
        # masking is unobservable past occupied-wins (every consumer reads
        # evidence only where ~occ2, and there hit_s == 0 for all s), so no
        # separate evidence accumulator exists
        revive = old_occ & ~occ & (contrib.miss_pk <= cfg.decay_miss_limit)
        occ2 = occ | revive
        evidence = jnp.where(
            ~old_occ & (old_ev > 0) & ~occ2 & old_valid,
            contrib.miss_pk + old_ev,
            contrib.miss_pk,
        )
        evidence = jnp.where(occ2, 0, evidence)                # occupied-wins
        msel = old_occ & occ2
        # mom masks: contrib carries RAW merged moments → mask by the batch
        # occupancy (cells no scan occupied contribute nothing); old mom is
        # occupancy-masked by induction and align_to applied alignment, so
        # occ2 is its only live factor
        mpk_c = moments.packed_voxel_mask(gridops.unpack_yz(occ), cfg.z_size)
        mpk = moments.packed_voxel_mask(gridops.unpack_yz(occ2), cfg.z_size)
        merged = VoxelGrid(
            hit_pk=contrib.hit_pk + jnp.where(msel, old.hit_pk, 0),
            miss_pk=contrib.miss_pk + jnp.where(msel, old.miss_pk, 0),
            minh_pk=jnp.where(msel, jnp.minimum(contrib.minh_pk, old.minh_pk), contrib.minh_pk),
            mom=jnp.where(mpk_c[:, None], contrib.mom, 0.0)
                + jnp.where(mpk[:, None], old.mom, 0.0),
            origin=origin,
        )

        # ---- 2D products: column reductions on the slab, stencils on the
        # gathered (tiny) 2D maps ----
        hm_slab = maps2d.height_map(cfg, occ2, merged.minh_pk, origin, ego_last, y_coords=y_coords)
        ihm_slab = maps2d.inferred_height_map(cfg, occ2, evidence, origin)
        hm_t = jax.lax.all_gather(hm_slab, SPACE_AXIS, axis=1, tiled=True)
        ihm_t = jax.lax.all_gather(ihm_slab, SPACE_AXIS, axis=1, tiled=True)
        hm = gridops.torus_to_window(hm_t, origin, grid_ndim=2)
        ihm = gridops.torus_to_window(ihm_t, origin, grid_ndim=2)
        sx, sy, rough = maps2d.slope_and_roughness(cfg, hm)
        ghd = maps2d.guess_height_delta(cfg, hm, ihm)
        sx_t = gridops.window_to_torus(sx, origin, grid_ndim=2)
        sy_t = gridops.window_to_torus(sy, origin, grid_ndim=2)
        pos_slab = maps2d.positive_obstacle_map(
            cfg, occ2, merged.hit_pk, merged.hit_pk + merged.miss_pk,
            jax.lax.dynamic_slice_in_dim(hm_t, ys0, Ys, axis=1),
            jax.lax.dynamic_slice_in_dim(sx_t, ys0, Ys, axis=1),
            jax.lax.dynamic_slice_in_dim(sy_t, ys0, Ys, axis=1),
            origin,
        )
        pos_t = jax.lax.all_gather(pos_slab, SPACE_AXIS, axis=1, tiled=True)
        pos = gridops.torus_to_window(pos_t, origin, grid_ndim=2)
        neg = maps2d.negative_obstacle_map(cfg, ghd)
        vis = maps2d.visibility_map(hm)
        products = MapProducts(
            origin=origin, height=hm, inferred_height=ihm, slope_x=sx, slope_y=sy,
            roughness=rough, guessed_height_delta=ghd, positive_obstacle=pos,
            negative_obstacle=neg, visibility=vis,
        )

        new_world = WorldState(grid=merged, evidence_pk=evidence, valid=jnp.asarray(True))
        return new_world, products

    scan_axes = DATA_AXIS if slab else _ALL_AXES
    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(
            world_pspecs(),
            P(scan_axes, None, None),
            P(scan_axes, None),
            P(scan_axes, None),
        ),
        out_specs=(world_pspecs(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def batched_step(cfg: GvomConfig, mesh: Mesh, world, scans, valid, egos,
                 raycast_impl: str = "auto", ingest: str = "auto"):
    return make_batched_step(cfg, mesh, raycast_impl, ingest)(world, scans, valid, egos)
