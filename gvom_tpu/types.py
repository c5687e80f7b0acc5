"""Pytree state containers.

The reference holds six parallel Python lists of device arrays guarded by
semaphores (gvom.py:56-67) plus `last_combined_*` attributes (gvom.py:77-83).
Here every piece of engine state is an immutable pytree threaded through jitted
pure functions — which is what makes the ring buffer race-free by construction
and the whole pipeline shardable with jax.sharding.

Dense-grid encoding (replaces the reference's index_map int encoding,
gvom.py:1152-1159):
    occupied          <=> hit > 0
    observed-empty    <=> hit == 0 and miss > 0     (reference: index == -miss-1)
    unobserved        <=> hit == 0 and miss == 0    (reference: index == -1)
`total_count` of the reference equals `hit + miss` here.

Moments are raw voxel-local sums: n (neighborhood point count, reference
metrics[9]), mean := S1 = sum of (p - v) over the support box (voxel-local, so
frame-INVARIANT under re-origining), m2 := R2 = sum of (p-v)(p-v)^T. The
reference's normalized forms are recovered at read time only (debug path):
mean_local = S1/n, covariance = R2/n - (S1/n)(S1/n)^T (upper triangle order
xx,xy,xz,yy,yz,zz, matching gvom.py:849-850). Raw sums make every merge a
plain masked add - associative, psum-able, and division-free in the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops.moments import N_SLOTS, packed_lanes

__all__ = [
    "VoxelGrid",
    "WorldState",
    "BufferState",
    "MapProducts",
    "empty_voxel_grid",
    "empty_world_state",
    "empty_buffer_state",
    "UNKNOWN_HEIGHT",
]

# Sentinel for "no height measured" in the 2D maps (reference −1000.0, gvom.py:289).
UNKNOWN_HEIGHT = -1000.0


class VoxelGrid(NamedTuple):
    """One dense ego-centered voxel map (a single scan's map, or a fused map).

    origin is in voxel units per axis (x,y in xy_resolution units, z in
    z_resolution units), following gvom.py:123-126.

    STORAGE LAYOUT (r5): the three scalar channels are stored lane-dense in
    the y-paired layout [X, Y/2, 2Z] — the contiguous reshape of the logical
    [X, Y, Z] grid (ops/grid.pack_yz). At the reference Z = 64 this fills
    TPU T(8,128) tiles exactly instead of padding 64 → 128 lanes, halving
    HBM footprint/traffic and VPU work for every hot consumer (the r4
    mega-combine post-mortem's named blocker, BENCHMARKS.md). The reshape
    preserves element order, so all elementwise merges/masks/psums run on
    the stored form unchanged; the `hit`/`miss`/`min_height` properties
    return unpacked [X, Y, Z] views for cold consumers (exporters, tests,
    checkpoints).
    """

    hit_pk: jnp.ndarray      # [X, Y/2, 2Z] int32 — lidar endpoint hits (y-paired layout)
    miss_pk: jnp.ndarray     # [X, Y/2, 2Z] int32 — ray pass-throughs (reference total = hit+miss)
    minh_pk: jnp.ndarray     # [X, Y/2, 2Z] float32 — sub-voxel z of lowest point, init 1.0 (gvom.py:1014)
    mom: jnp.ndarray         # [X, 5, Y, Vp] float32 — the ten raw voxel-local moment sums
                             #   (n, S1, R2 — reference metrics[0:10], gvom.py:1170-1299) in the
                             #   packed two-channels-per-lane-half layout of ops.moments
                             #   (pack_moments/unpack_moments); all hot-path ops on it are
                             #   elementwise, the split happens only at cold read points
    origin: jnp.ndarray      # [3] int32 — grid origin in voxel units

    @property
    def hit(self) -> jnp.ndarray:
        """[.., X, Y, Z] unpacked view (cold paths; hot code uses hit_pk)."""
        from gvom_tpu.ops.grid import unpack_yz

        return unpack_yz(self.hit_pk)

    @property
    def miss(self) -> jnp.ndarray:
        from gvom_tpu.ops.grid import unpack_yz

        return unpack_yz(self.miss_pk)

    @property
    def min_height(self) -> jnp.ndarray:
        from gvom_tpu.ops.grid import unpack_yz

        return unpack_yz(self.minh_pk)

    @classmethod
    def from_logical(cls, hit, miss, min_height, mom, origin) -> "VoxelGrid":
        """Construct from logical [.., X, Y, Z] channel arrays (cold paths,
        tests); packs into the stored y-paired layout."""
        from gvom_tpu.ops.grid import pack_yz

        return cls(hit_pk=pack_yz(jnp.asarray(hit)),
                   miss_pk=pack_yz(jnp.asarray(miss)),
                   minh_pk=pack_yz(jnp.asarray(min_height)),
                   mom=jnp.asarray(mom), origin=jnp.asarray(origin))

    @property
    def occupied(self) -> jnp.ndarray:
        return self.hit > 0

    @property
    def total(self) -> jnp.ndarray:
        return self.hit + self.miss


class WorldState(NamedTuple):
    """The persistent fused map (reference `last_combined_*`, gvom.py:77-83).

    `evidence` lives HERE, not on VoxelGrid: for a single scan it is exactly
    `miss` at unoccupied voxels (derivable on the fly — storing it per buffer
    slot cost a redundant grid-sized write per ingest plus grid-sized reads
    per combine), while the FUSED form below is a genuine combine output —
    the reference's index-map negative-evidence accumulator with slot-order
    latching and the occupied-wins overwrite (gvom.py:941-997), which is not
    a function of the fused hit/miss channels.
    """

    grid: VoxelGrid
    evidence_pk: jnp.ndarray  # [X, Y/2, 2Z] int32 (y-paired layout) — pass count accumulated
                              #   while the voxel stayed unoccupied (reference
                              #   index == -evidence-1, gvom.py:962-997)
    valid: jnp.ndarray       # [] bool — False until the first combine (no previous map)

    @classmethod
    def from_logical(cls, grid: "VoxelGrid", evidence, valid) -> "WorldState":
        """Construct with a logical [X, Y, Z] evidence array (cold paths)."""
        from gvom_tpu.ops.grid import pack_yz

        return cls(grid=grid, evidence_pk=pack_yz(jnp.asarray(evidence)),
                   valid=jnp.asarray(valid))

    @property
    def evidence(self) -> jnp.ndarray:
        """[X, Y, Z] unpacked view (cold paths; hot code uses evidence_pk)."""
        from gvom_tpu.ops.grid import unpack_yz

        return unpack_yz(self.evidence_pk)


class BufferState(NamedTuple):
    """Functional ring buffer of per-scan voxel maps (reference gvom.py:56-67).

    Slot arrays are stacked along a leading buffer axis. `cursor` is the next
    insertion slot; `slot_valid` marks slots that hold a real scan. `last_slot`
    mirrors the reference's `last_buffer_index` (gvom.py:58) — the most recent
    scan, whose origin becomes the combined-map origin (gvom.py:184).
    """

    grids: VoxelGrid         # each leaf has leading dim [B+1, ...]; slot B is a
                             # write-off slot for degenerate scans (never read) —
                             # it keeps the hot-path insert an unconditional
                             # dynamic-update with no old-slot gather/select
    slot_valid: jnp.ndarray  # [B] bool
    cursor: jnp.ndarray      # [] int32
    last_slot: jnp.ndarray   # [] int32


class MapProducts(NamedTuple):
    """All 2D outputs of one combine step (reference gvom.py:286-354)."""

    origin: jnp.ndarray                 # [3] int32, voxel units (world = origin * resolution)
    height: jnp.ndarray                 # [X, Y] f32, UNKNOWN_HEIGHT sentinel where unknown
    inferred_height: jnp.ndarray        # [X, Y] f32
    slope_x: jnp.ndarray                # [X, Y] f32 (rad)
    slope_y: jnp.ndarray                # [X, Y] f32 (rad)
    roughness: jnp.ndarray              # [X, Y] f32 (log plane-fit MSE; -1 where undefined)
    guessed_height_delta: jnp.ndarray   # [X, Y] f32
    positive_obstacle: jnp.ndarray      # [X, Y] int32 (0-100 density, 100 on slope trigger)
    negative_obstacle: jnp.ndarray      # [X, Y] int32 (0 or 100)
    visibility: jnp.ndarray             # [X, Y] int32 (0/1)

    def origin_world(self, cfg: GvomConfig) -> np.ndarray:
        o = np.asarray(self.origin, dtype=np.float64)
        return o * np.array([cfg.xy_resolution, cfg.xy_resolution, cfg.z_resolution])


# ----------------------------------------------------------------------
# constructors


def empty_voxel_grid(cfg: GvomConfig) -> VoxelGrid:
    x, y, z = cfg.grid_shape
    assert y % 2 == 0, "xy_size must be even (y-paired channel storage)"
    return VoxelGrid(
        hit_pk=jnp.zeros((x, y // 2, 2 * z), jnp.int32),
        miss_pk=jnp.zeros((x, y // 2, 2 * z), jnp.int32),
        minh_pk=jnp.ones((x, y // 2, 2 * z), jnp.float32),
        mom=jnp.zeros((x, N_SLOTS, y, packed_lanes(z)), jnp.float32),
        origin=jnp.zeros((3,), jnp.int32),
    )


def empty_world_state(cfg: GvomConfig) -> WorldState:
    x, y, z = cfg.grid_shape
    return WorldState(
        grid=empty_voxel_grid(cfg),
        evidence_pk=jnp.zeros((x, y // 2, 2 * z), jnp.int32),
        valid=jnp.asarray(False),
    )


def _stack(grid: VoxelGrid, b: int) -> VoxelGrid:
    return VoxelGrid(*[jnp.broadcast_to(leaf, (b,) + leaf.shape).copy() for leaf in grid])


def empty_buffer_state(cfg: GvomConfig) -> BufferState:
    b = cfg.buffer_size
    return BufferState(
        grids=_stack(empty_voxel_grid(cfg), b + 1),
        slot_valid=jnp.zeros((b,), bool),
        cursor=jnp.asarray(0, jnp.int32),
        last_slot=jnp.asarray(0, jnp.int32),
    )
