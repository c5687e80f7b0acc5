"""The mapping pipelines: pure jitted functions assembled from ops/.

Reference call-stack parity (SURVEY.md §3):
  * ingest_scan        ≙ process_pointcloud's device work (gvom.py:99-161)
  * buffer_insert      ≙ the ring-buffer write (gvom.py:163-175), functional
  * combine            ≙ combine_maps (gvom.py:177-354)
  * full_step          = ingest + insert + combine fused in one jit — the TPU
                         replacement for the reference's two host threads.

Every function is shape-static and jit-safe; degenerate inputs (empty cloud,
zero occupied voxels, empty buffer — reference warnings at gvom.py:107-109,
148-150, 179-181) are masked no-op steps signalled by boolean flags, not
control flow.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops import binning, maps2d, moments
from gvom_tpu.ops import grid as gridops
from gvom_tpu.ops import raycast
from gvom_tpu.types import (
    BufferState,
    MapProducts,
    VoxelGrid,
    WorldState,
    empty_voxel_grid,
)

__all__ = ["ingest_scan", "buffer_insert", "combine", "ingest_and_insert", "full_step"]


def _tree_slice(tree, i):
    return jax.tree_util.tree_map(lambda l: l[i], tree)


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


# ----------------------------------------------------------------------
# ingest


def ingest_scan(
    cfg: GvomConfig,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    ego_position: jnp.ndarray,
    transform: Optional[jnp.ndarray] = None,
    raycast_impl: str = "auto",
    origin: Optional[jnp.ndarray] = None,
    binning_impl: str = "auto",
    y_window=None,
) -> Tuple[VoxelGrid, jnp.ndarray]:
    """One scan → dense voxel map. Returns (grid, scan_ok).

    scan_ok is False when the scan produced zero occupied voxels — the
    reference drops such scans without buffering them (gvom.py:148-150).
    `origin` pins the map frame (batched replay rasterizes all scans into a
    common frame); default is the reference's ego-centered origin.
    `y_window` = (ys0, Ys) restricts every accumulated array to that torus
    y-slab (the spatially sharded ingest) — all grid arrays come back
    [X, Ys, Z]-shaped and scan_ok refers to the slab. Both the Pallas and
    the XLA paths take the window (SURVEY §2.3 item 2).
    """
    ego = ego_position.astype(jnp.float32)
    p, keep = binning.prepare_points(cfg, points, valid, ego, transform)
    if origin is None:
        origin = gridops.compute_origin(cfg, ego)
    passes = raycast.ray_pass_counts(cfg, p, keep, ego, origin, impl=raycast_impl,
                                     y_window=y_window)

    use_fused = False
    if binning_impl in ("auto", "fused"):
        try:
            from gvom_tpu.ops import pallas_kernels
        except ImportError:  # pallas unavailable: 'auto' degrades to XLA
            if binning_impl == "fused":
                raise
            pallas_kernels = None
        if pallas_kernels is not None:
            use_fused = binning_impl == "fused" or pallas_kernels.use_fast_path()
    if use_fused:
        hit, min_height, mom = pallas_kernels.fused_point_moments(
            cfg, p, keep, origin, y_window=y_window
        )
    elif y_window is not None:
        hit, min_height, mom = binning.slab_point_moments(
            cfg, p, keep, origin, y_window[0], y_window[1]
        )
    else:
        bins = binning.bin_points(cfg, p, keep, origin)
        hit, min_height = bins.hit, bins.min_height            # torus-placed
        n, s1, s2 = moments.box_aggregate_moments(cfg, bins)   # window layout
        n = gridops.window_to_torus(n, origin)
        s1 = gridops.window_to_torus(s1, origin)
        s2 = gridops.window_to_torus(s2, origin)
        mom = moments.pack_moments(n, s1, s2)
        # occupancy pre-mask — see fused_point_moments' epilogue note
        mom = jnp.where(moments.packed_voxel_mask(hit > 0, cfg.z_size)[:, None], mom, 0.0)
    # moments ARE occupancy-masked at ingest (r5): stored zero wherever
    # hit == 0. Every consumer only reads them under (hit > 0) — reference
    # combine_metrics gvom.py:198-266 — so this is observation-equivalent,
    # and it turns the combine's per-slot mom merge masks into pure
    # axis-alignment broadcasts (no data-dependent packed→mom-layout mask
    # interleaves, which cost materialized pred copies per slot). The Pallas
    # epilogue applies the mask in-kernel for free.
    # A scan's negative evidence is exactly `miss` at unoccupied voxels —
    # derived by consumers, never stored (one grid write per ingest + one
    # read per combine slot saved; WorldState.evidence_pk docstring).
    # Channels are stored lane-dense (y-paired [X, Y/2, 2Z], ops/grid) — the
    # pack is a contiguous reshape the producer fusion writes directly.
    grid = VoxelGrid(
        hit_pk=gridops.pack_yz(hit),
        miss_pk=gridops.pack_yz(passes),
        minh_pk=gridops.pack_yz(min_height),
        mom=mom,
        origin=origin,
    )
    scan_ok = jnp.any(grid.hit_pk > 0)
    return grid, scan_ok


# ----------------------------------------------------------------------
# ring buffer


def buffer_insert(cfg: GvomConfig, buf: BufferState, grid: VoxelGrid, scan_ok: jnp.ndarray) -> BufferState:
    """Functional ring-buffer write (gvom.py:163-175). No-op when !scan_ok.

    The write is a single unconditional dynamic-update into slot `cursor`, or
    into the write-off slot B when the scan is degenerate — never a gather of
    the old slot or a select against it. Any data dependence on the buffer's
    prior contents defeats XLA's in-place aliasing of the loop carry and turns
    the insert into multiple full-buffer (~1 GB) copies — measured 12.6 ms/step
    vs <1 ms for this form at the reference config.
    """
    cur = jnp.where(scan_ok, buf.cursor, jnp.int32(cfg.buffer_size))
    # r4 note: XLA materializes this update as a full-buffer rebuild fusion
    # (~0.67 ms/step traced — fusion.186 + carry copy). Barriering `grid` to
    # force a standalone, aliasable DUS measured WORSE (+0.33 ms: the
    # producer chain then writes its own copy and the rebuild remains), so
    # the rebuild fusion is kept; it is the cheapest form XLA offers here.
    new_grids = jax.tree_util.tree_map(
        lambda stacked, leaf: jax.lax.dynamic_update_index_in_dim(stacked, leaf, cur, 0),
        buf.grids,
        grid,
    )
    cur = buf.cursor
    return BufferState(
        grids=new_grids,
        slot_valid=buf.slot_valid.at[cur].set(scan_ok | buf.slot_valid[cur]),
        cursor=jnp.where(scan_ok, (cur + 1) % cfg.buffer_size, cur).astype(jnp.int32),
        last_slot=jnp.where(scan_ok, cur, buf.last_slot).astype(jnp.int32),
    )


def ingest_and_insert(
    cfg: GvomConfig,
    buf: BufferState,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    ego_position: jnp.ndarray,
    transform: Optional[jnp.ndarray] = None,
    raycast_impl: str = "auto",
) -> Tuple[BufferState, jnp.ndarray]:
    try:
        from gvom_tpu.ops import pallas_kernels
    except ImportError:
        pallas_kernels = None
    if (pallas_kernels is not None and pallas_kernels.use_fast_path()
            and raycast_impl in ("auto", "matmul")):
        return _ingest_and_insert_fused(cfg, buf, points, valid, ego_position,
                                        transform, raycast_impl)
    grid, scan_ok = ingest_scan(cfg, points, valid, ego_position, transform, raycast_impl)
    return buffer_insert(cfg, buf, grid, scan_ok), scan_ok


def _ingest_and_insert_fused(
    cfg: GvomConfig,
    buf: BufferState,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    ego_position: jnp.ndarray,
    transform: Optional[jnp.ndarray] = None,
    raycast_impl: str = "auto",
    interpret: bool = False,
) -> Tuple[BufferState, jnp.ndarray]:
    """TPU fast path for ingest+insert: the moments kernel's epilogue writes
    the mom channel DIRECTLY into the ring buffer's stacked array at the
    target slot, pre-rolled to torus x (VERDICT r4 ask #5's carry cluster:
    the dynamic-update otherwise materializes a full-buffer mom rebuild
    fusion, ~0.51 ms/scan traced, plus a 0.18 ms mom roll). Semantically
    identical to ingest_scan + buffer_insert: scan_ok is decided up front
    from the in-grid-endpoint predicate (≡ "produced ≥ 1 occupied voxel",
    gvom.py:148-150) so the write-off slot B still absorbs degenerate
    scans, and the remaining channels take the standard unconditional
    dynamic-update."""
    from gvom_tpu.ops import pallas_kernels

    ego = ego_position.astype(jnp.float32)
    p, keep = binning.prepare_points(cfg, points, valid, ego, transform)
    origin = gridops.compute_origin(cfg, ego)
    res = gridops.resolution_vector(cfg)
    vox = jnp.floor(p / res - origin.astype(jnp.float32)).astype(jnp.int32)
    scan_ok = jnp.any(keep & gridops.in_bounds(cfg, vox))
    slot = jnp.where(scan_ok, buf.cursor, jnp.int32(cfg.buffer_size))

    passes = raycast.ray_pass_counts(cfg, p, keep, ego, origin, impl=raycast_impl)
    hit, minh, new_mom = pallas_kernels.fused_point_moments(
        cfg, p, keep, origin, interpret=interpret, mom_into=(buf.grids.mom, slot))

    def dus(stacked, leaf):
        return jax.lax.dynamic_update_index_in_dim(stacked, leaf, slot, 0)

    grids = buf.grids._replace(
        mom=new_mom,
        hit_pk=dus(buf.grids.hit_pk, gridops.pack_yz(hit)),
        miss_pk=dus(buf.grids.miss_pk, gridops.pack_yz(passes)),
        minh_pk=dus(buf.grids.minh_pk, gridops.pack_yz(minh)),
        origin=dus(buf.grids.origin, origin),
    )
    cur = buf.cursor
    return BufferState(
        grids=grids,
        slot_valid=buf.slot_valid.at[cur].set(scan_ok | buf.slot_valid[cur]),
        cursor=jnp.where(scan_ok, (cur + 1) % cfg.buffer_size, cur).astype(jnp.int32),
        last_slot=jnp.where(scan_ok, cur, buf.last_slot).astype(jnp.int32),
    ), scan_ok


# ----------------------------------------------------------------------
# fusion + map products


def _mom_axis_mask(cfg, target_origin, src_origin, valid):
    """[X, 1, Y, Vp] alignment mask in mom orientation (pure iota factors).
    Slot moms are occupancy-pre-masked at ingest, so this alignment factor
    (∧ validity) is their complete merge mask."""
    Z = cfg.z_size
    ax = gridops._overlap_axis_masks(cfg, target_origin, src_origin)
    pad = moments.packed_lanes(Z) - 2 * Z
    myz = ax[1][:, None] & ax[2][None, :]
    parts = [myz, myz]
    if pad:
        parts.append(jnp.zeros(myz.shape[:-1] + (pad,), bool))
    m = ax[0][:, None, None] & jnp.concatenate(parts, axis=-1)[None] & valid
    return m[:, None]


def combine(
    cfg: GvomConfig,
    buf: BufferState,
    world: WorldState,
    ego_position: jnp.ndarray,
    impl: str = "auto",
) -> Tuple[WorldState, MapProducts, jnp.ndarray]:
    """Fuse buffered scans + decayed previous world map, derive the 2D maps.

    Slot iteration order and the occupied-wins / miss-accumulation / staleness
    veto semantics follow gvom.py:198-266 & 941-997. Returns
    (new world, products, combine_ok).

    impl: "fused" takes the Pallas combine (one pass for phase A + phase B
    scalar channels + the column products, with the mom merge as an XLA
    speed-of-light fusion — pallas_kernels.fused_combine, bitwise-identical);
    "xla" forces this module's reference-shaped multi-fusion path. "auto" is
    "fused" on TPU since r5 (measured 3.35 ms vs XLA's 3.69 on v5e at the
    reference config once the lane-dense layout landed — BENCHMARKS.md r5)
    and "xla" elsewhere."""
    ego = ego_position.astype(jnp.float32)
    origin = buf.grids.origin[buf.last_slot]
    any_valid = jnp.any(buf.slot_valid)

    if impl == "auto":
        try:
            from gvom_tpu.ops import pallas_kernels
        except ImportError:
            pallas_kernels = None
        if pallas_kernels is not None and pallas_kernels.use_fast_path():
            impl = "fused"
    if impl == "fused":
        # explicit request: let ImportError propagate if pallas is absent
        return _combine_fused(cfg, buf, world, ego, origin, any_valid)

    # --- phase A: occupancy + negative evidence (slot order latches) ---
    # torus layout: alignment is masks only — no data movement. The re-origin
    # mask is folded INTO each channel's select rather than applied up front
    # (gridops.align_to): a pre-aligned slot is consumed by both phases, which
    # tempts XLA into materializing ~200 MB masked copies per slot; folding
    # keeps every channel's merge a single fused read of the raw buffer.
    # Everything below runs on the lane-dense y-paired channel storage
    # ([X, Y/2, 2Z], ops/grid) — same element order as [X, Y, Z], full tiles.
    X, Y, Z = cfg.grid_shape
    pshape = (X, Y // 2, 2 * Z)
    slots = []
    for i in range(cfg.buffer_size):
        g = _tree_slice(buf.grids, i)
        amask = gridops.overlap_mask_packed(cfg, origin, g.origin) & buf.slot_valid[i]
        slots.append((g, amask))

    occ = jnp.zeros(pshape, bool)
    evidence = jnp.zeros(pshape, jnp.int32)
    for g, am in slots:
        s_occ = (g.hit_pk > 0) & am
        # a scan grid's negative evidence ≡ its miss count at unoccupied
        # voxels (derived, not stored — WorldState.evidence docstring)
        s_ev = jnp.where(am & ~s_occ, g.miss_pk, 0)
        evidence = jnp.where((s_ev > 0) & ~occ, evidence + s_ev, evidence)
        occ = occ | s_occ

    old = world.grid
    old_mask = gridops.overlap_mask_packed(cfg, origin, old.origin) & world.valid
    old_occ = (old.hit_pk > 0) & old_mask
    revive = old_occ & ~occ & (evidence <= cfg.decay_miss_limit)   # staleness veto (gvom.py:992)
    occ = occ | revive
    old_ev = jnp.where(old_mask, world.evidence_pk, 0)
    evidence = jnp.where(~old_occ & (old_ev > 0) & ~occ, evidence + old_ev, evidence)
    # occupied-wins (gvom.py:947-950 overwrites negative evidence on allocate):
    # a later slot occupying a cell discards evidence earlier slots accumulated
    evidence = jnp.where(occ, 0, evidence)

    # --- phase B: data fusion where source voxel occupied & target occupied ---
    hit = jnp.zeros(pshape, jnp.int32)
    miss = jnp.zeros(pshape, jnp.int32)
    min_height = jnp.ones(pshape, jnp.float32)
    mom = jnp.zeros((X, moments.N_SLOTS, Y, moments.packed_lanes(Z)), jnp.float32)

    def merge_data(acc, src: VoxelGrid, src_sel, mom_mask):
        h, ms, mh, mo = acc
        m = src_sel
        h = h + jnp.where(m, src.hit_pk, 0)
        ms = ms + jnp.where(m, src.miss_pk, 0)
        mh = jnp.where(m, jnp.minimum(mh, src.minh_pk), mh)
        # raw voxel-local sums: a plain masked add, directly in packed
        # layout. Slot moms are occupancy-pre-masked at ingest, so their
        # merge mask is the pure axis-alignment broadcast (mom orientation,
        # built from per-axis factors — no data interleave); only the old
        # world's mask carries the data-dependent occ2 factor.
        mo = mo + jnp.where(mom_mask, src.mom, 0.0)
        return h, ms, mh, mo

    def mom_axis_mask(src_origin, valid):
        return _mom_axis_mask(cfg, origin, src_origin, valid)

    acc = (hit, miss, min_height, mom)
    for i, (g, am) in enumerate(slots):
        acc = merge_data(acc, g, (g.hit_pk > 0) & am,
                         mom_axis_mask(g.origin, buf.slot_valid[i]))
    # old mom is occ-masked by induction (combine output moms are zero at
    # unoccupied cells); the remaining factors are alignment ∧ occ2
    occ2_mom = moments.packed_voxel_mask(gridops.unpack_yz(occ), cfg.z_size)
    old_mom_mask = mom_axis_mask(old.origin, world.valid) & occ2_mom[:, None]
    acc = merge_data(acc, old, old_occ & occ, old_mom_mask)
    hit, miss, min_height, mom = acc

    new_grid = VoxelGrid(
        hit_pk=hit,
        miss_pk=miss,
        minh_pk=min_height,
        mom=mom,
        origin=origin,
    )
    new_world = WorldState(grid=new_grid, evidence_pk=evidence, valid=jnp.asarray(True))
    new_world = _tree_where(any_valid, new_world, world)

    # --- 2D products (gvom.py:286-354) ---
    # column reductions run on the torus grid (no data movement); only the
    # small 2D maps are canonicalized (window-relative layout) for the
    # stencil ops and the user-facing products
    hm_t = maps2d.height_map(cfg, occ, min_height, origin, ego)
    ihm_t = maps2d.inferred_height_map(cfg, occ, evidence, origin)
    hm = gridops.torus_to_window(hm_t, origin, grid_ndim=2)
    ihm = gridops.torus_to_window(ihm_t, origin, grid_ndim=2)
    slope_x, slope_y, rough = maps2d.slope_and_roughness(cfg, hm)
    ghd = maps2d.guess_height_delta(cfg, hm, ihm)
    sx_t = gridops.window_to_torus(slope_x, origin, grid_ndim=2)
    sy_t = gridops.window_to_torus(slope_y, origin, grid_ndim=2)
    pos_t = maps2d.positive_obstacle_map(cfg, occ, hit, hit + miss, hm_t, sx_t, sy_t, origin)
    pos = gridops.torus_to_window(pos_t, origin, grid_ndim=2)
    neg = maps2d.negative_obstacle_map(cfg, ghd)
    vis = maps2d.visibility_map(hm)
    products = MapProducts(
        origin=origin,
        height=hm,
        inferred_height=ihm,
        slope_x=slope_x,
        slope_y=slope_y,
        roughness=rough,
        guessed_height_delta=ghd,
        positive_obstacle=pos,
        negative_obstacle=neg,
        visibility=vis,
    )
    return new_world, products, any_valid


def _combine_fused(cfg, buf, world, ego, origin, any_valid, interpret=False):
    """Mega-combine path: one Pallas pass for phases A/B (scalar channels) +
    column products; the mom merge runs as an XLA masked-add fusion (it is
    HBM-bound and XLA already runs it at speed of light — carrying mom
    through the kernel measured ~1.5 ms slower, see the kernel docstring),
    and the tiny [X,X] stencil ops (slope/rough/guess/negative) stay XLA."""
    from gvom_tpu.ops import pallas_kernels

    hit, miss, minh, evidence, hm_t, ihm_t, pnum, pden, bok = (
        pallas_kernels.fused_combine(cfg, buf, world, ego, origin, interpret=interpret))

    # ---- mom merge (XLA): identical addend structure to combine()'s
    # merge_data — slot masks are pure alignment (moms pre-masked at
    # ingest), the old world's mask adds the occ2 factor (hit > 0 ⇔ occ2:
    # phase B writes a positive hit at every occupied cell) ----
    X, Y, Z = cfg.grid_shape
    mom = jnp.zeros((X, moments.N_SLOTS, Y, moments.packed_lanes(Z)), jnp.float32)
    for i in range(cfg.buffer_size):
        g = _tree_slice(buf.grids, i)
        mom = mom + jnp.where(
            _mom_axis_mask(cfg, origin, g.origin, buf.slot_valid[i]), g.mom, 0.0)
    occ2 = jnp.where(any_valid, hit > 0,
                     jnp.zeros_like(hit, dtype=bool))  # pre-latch occupancy
    occ2_mom = moments.packed_voxel_mask(gridops.unpack_yz(occ2), cfg.z_size)
    old_mask = _mom_axis_mask(cfg, origin, world.grid.origin, world.valid) & occ2_mom[:, None]
    mom = mom + jnp.where(old_mask, world.grid.mom, 0.0)
    mom = jnp.where(any_valid, mom, world.grid.mom)

    origin_out = jnp.where(any_valid, origin, world.grid.origin)
    grid = VoxelGrid(hit_pk=hit, miss_pk=miss, minh_pk=minh, mom=mom,
                     origin=origin_out)
    new_world = WorldState(
        grid=grid,
        evidence_pk=evidence,
        valid=world.valid | any_valid,
    )

    hm = gridops.torus_to_window(hm_t, origin, grid_ndim=2)
    ihm = gridops.torus_to_window(ihm_t, origin, grid_ndim=2)
    slope_x, slope_y, rough = maps2d.slope_and_roughness(cfg, hm)
    ghd = maps2d.guess_height_delta(cfg, hm, ihm)
    sx_t = gridops.window_to_torus(slope_x, origin, grid_ndim=2)
    sy_t = gridops.window_to_torus(slope_y, origin, grid_ndim=2)
    # positive-obstacle assembly from the kernel's band sums — identical
    # arithmetic to maps2d.positive_obstacle_map's tail (int sums → f32)
    steep = jnp.sqrt(sx_t * sx_t + sy_t * sy_t) >= jnp.float32(cfg.slope_obstacle_threshold)
    num = pnum.astype(jnp.float32)
    den = pden.astype(jnp.float32)
    dens = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    val = (dens * 100.0).astype(jnp.int32)
    pos_t = jnp.where(steep, 100, jnp.where(bok > 0, val, 0))
    pos = gridops.torus_to_window(pos_t, origin, grid_ndim=2)
    neg = maps2d.negative_obstacle_map(cfg, ghd)
    vis = maps2d.visibility_map(hm)
    products = MapProducts(
        origin=origin,
        height=hm,
        inferred_height=ihm,
        slope_x=slope_x,
        slope_y=slope_y,
        roughness=rough,
        guessed_height_delta=ghd,
        positive_obstacle=pos,
        negative_obstacle=neg,
        visibility=vis,
    )
    return new_world, products, any_valid


# ----------------------------------------------------------------------
# fused step (the flagship single-chip entry point)


@partial(jax.jit, static_argnames=("cfg", "raycast_impl"))
def full_step(
    cfg: GvomConfig,
    buf: BufferState,
    world: WorldState,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    ego_position: jnp.ndarray,
    transform: Optional[jnp.ndarray] = None,
    raycast_impl: str = "auto",
) -> Tuple[BufferState, WorldState, MapProducts, jnp.ndarray]:
    """Ingest one scan and run one combine — the whole reference loop
    (sensor callback + timer callback) as a single compiled step."""
    buf, scan_ok = ingest_and_insert(cfg, buf, points, valid, ego_position, transform, raycast_impl)
    world, products, ok = combine(cfg, buf, world, ego_position)
    return buf, world, products, ok & (scan_ok | jnp.any(buf.slot_valid))
