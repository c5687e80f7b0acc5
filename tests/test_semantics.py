"""Semantic integration tests on analytic terrain + algebraic property tests.

SURVEY.md §4's integration plan: features with known ground truth — a ramp has
a known slope, a trench is a negative obstacle, a wall a positive obstacle, and
the shadow of a wall a visibility hole (reference behavior: gvom.py:477-521,
gvom.py:412-422). Property tests: raycast endpoint exclusion (gvom.py:1127
marches to `dist - 1`), the occupied/evidence encoding partition
(gvom.py:1152-1159), and additivity of the raw-moment formulation (our
replacement for the reference's two-pass mean/cov, SURVEY.md §7 hard part #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast inner-loop tier (see pyproject markers)

from gvom_tpu.config import GvomConfig
from gvom_tpu.engine import Gvom
from gvom_tpu.io import synthetic
from gvom_tpu.models import pipeline
from gvom_tpu.ops import binning, raycast
from gvom_tpu.ops import grid as gridops
from gvom_tpu.types import empty_buffer_state, empty_world_state

from conftest import make_scan


def make_engine(**over):
    kw = dict(
        xy_resolution=0.4, z_resolution=0.4, xy_size=64, z_size=32,
        buffer_size=2, min_distance=1.0, positive_obstacle_threshold=0.5,
        negative_obstacle_threshold=0.5, slope_obstacle_threshold=0.3,
        robot_height=2.0, robot_radius=1.2, ground_to_lidar_height=1.5,
        xy_eigen_dist=1, z_eigen_dist=1, max_points=32768,
    )
    kw.update(over)
    return Gvom(config=GvomConfig(**kw))


def world_to_cell(g: Gvom, origin, x, y):
    """World meters → window-relative 2D map cell (origin is in meters,
    reference combine_maps return contract gvom.py:351-354)."""
    res = g.config.xy_resolution
    cx = int(np.floor((x - origin[0]) / res))
    cy = int(np.floor((y - origin[1]) / res))
    return cx, cy


def drive(g: Gvom, terrain, egos, channels=48, n_az=128, max_range=24.0):
    out = None
    for i, ego in enumerate(egos):
        pts = make_scan(terrain, ego, n_az=n_az, channels=channels, seed=i,
                        cfg=g.config, max_range=max_range)
        g.process_pointcloud(pts, ego)
        out = g.combine_maps()
    return out


def test_wall_is_positive_obstacle():
    g = make_engine()
    terrain = synthetic.wall_terrain(x_wall=6.0, height=3.0, thickness=0.8)
    egos = [np.array([0.1, 0.05, 1.5]), np.array([0.4, 0.15, 1.5])]
    # dense scan: the density path counts only voxels with >10 hits
    # (gvom.py:513-517), so the wall face needs real lidar-like density
    origin, pos, neg, rough, vis = drive(g, terrain, egos, channels=96, n_az=256)
    cx, cy = world_to_cell(g, origin, 6.0, 0.0)
    band = pos[cx - 1 : cx + 2, cy - 6 : cy + 7]
    # int(mean slab hit-density × 100) (gvom.py:513-519); the reference ROS
    # node calls > density_threshold=50 a hard obstacle (gvom_ros.py:141-142)
    assert band.max() > 50, f"wall not flagged: band max {band.max()}"
    # observed open ground short of the wall is not an obstacle (the nearest
    # visible ground is at 1.5/tan(22.5deg) = 3.6 m -- the lidar blind ring)
    ox, oy = world_to_cell(g, origin, 4.5, 0.0)
    assert pos[ox, oy] == 0


def test_trench_is_negative_obstacle():
    g = make_engine()
    terrain = synthetic.trench_terrain(x_center=7.0, width=4.0, depth=3.0)
    egos = [np.array([0.1, 0.05, 1.5]), np.array([0.45, 0.2, 1.5])]
    origin, pos, neg, rough, vis = drive(g, terrain, egos)
    lo, _ = world_to_cell(g, origin, 5.0, 0.0)
    hi, _ = world_to_cell(g, origin, 9.0, 0.0)
    _, cy = world_to_cell(g, origin, 0.0, 0.0)
    band = neg[lo : hi + 1, cy - 8 : cy + 9]
    assert band.max() == 100, f"trench not flagged: band max {band.max()}"
    # flat ground in front of the trench is clean
    ox, oy = world_to_cell(g, origin, 2.5, 0.0)
    assert neg[ox, oy] == 0


def test_ramp_slope_angle():
    g = make_engine()
    grade = 0.3  # rise/run → expected |slope| = atan(0.3)
    terrain = synthetic.ramp_terrain(slope_x=grade)
    egos = [np.array([0.1, 0.05, 1.6]), np.array([0.5, 0.2, 1.7])]
    drive(g, terrain, egos, channels=64)
    pr = g.products
    assert pr is not None
    slope = np.hypot(np.asarray(pr.slope_x), np.asarray(pr.slope_y))
    vis = np.asarray(pr.visibility)
    # interior observed cells only (stencil needs known neighbors)
    known = (vis > 0) & (np.asarray(pr.height) > -999)
    interior = known & np.roll(known, 1, 0) & np.roll(known, -1, 0) \
        & np.roll(known, 1, 1) & np.roll(known, -1, 1)
    vals = slope[interior]
    assert len(vals) > 50
    med = float(np.median(vals))
    assert abs(med - np.arctan(grade)) < 0.05, f"median slope {med} vs {np.arctan(grade)}"


def test_wall_shadow_visibility_hole():
    g = make_engine()
    terrain = synthetic.wall_terrain(x_wall=6.0, height=3.0, thickness=0.8)
    egos = [np.array([0.1, 0.05, 1.5]), np.array([0.4, 0.15, 1.5])]
    origin, pos, neg, rough, vis = drive(g, terrain, egos)
    _, cy = world_to_cell(g, origin, 0.0, 0.0)
    # ground ahead of the wall (outside the FOV blind ring) is seen …
    ax, _ = world_to_cell(g, origin, 4.5, 0.0)
    assert vis[ax, cy] == 1
    # … ground in the wall's lidar shadow is not
    sx, _ = world_to_cell(g, origin, 9.0, 0.0)
    shadow = vis[sx : sx + 4, cy - 2 : cy + 3]
    assert shadow.max() == 0, f"shadow unexpectedly visible: {shadow}"


# ----------------------------------------------------------------------
# property tests


@pytest.fixture(scope="module")
def prop_cfg():
    return GvomConfig(xy_size=32, z_size=16, max_points=512, buffer_size=2)


def test_raycast_never_counts_endpoint(prop_cfg):
    """The DDA stops short of the endpoint voxel (gvom.py:1127: range(1, dist-1)):
    a voxel whose only evidence is one ray's endpoint has pass count 0."""
    cfg = prop_cfg
    ego = np.array([0.21, -0.13, 1.37], np.float32)
    rng = np.random.default_rng(3)
    # isolated endpoints in many directions, incl. axis-aligned and diagonal
    dirs = np.array(
        [[1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0],
         [1, 1, 0], [1, -1, 0.2], [-1, 1, -0.2], [0.6, 0.8, 0.1]]
        + rng.normal(size=(24, 3)).tolist()
    )
    dirs[:, 2] *= 0.3
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = ego[None, :] + dirs * rng.uniform(3.0, 5.5, size=(len(dirs), 1))
    pad, mask = synthetic.pad_scan(pts, cfg.max_points)
    e = jnp.asarray(ego)
    p, keep = binning.prepare_points(cfg, jnp.asarray(pad), jnp.asarray(mask), e, None)
    origin = gridops.compute_origin(cfg, e)
    passes = np.asarray(raycast.ray_pass_counts(cfg, p, keep, e, origin, impl="xla"))
    res = np.array([cfg.xy_resolution, cfg.xy_resolution, cfg.z_resolution])
    vox = np.floor(pts / res[None, :]).astype(int)
    # keep endpoints whose voxel is unique in this scan (no other ray ends or
    # passes nearby along the same line is fine — pass-through by OTHER rays
    # is legal; so test only endpoints isolated from every other ray's segment)
    og = np.asarray(origin)
    size = np.array(cfg.grid_shape)
    for v, pt in zip(vox, pts):
        w = (v - og) % size  # torus cell of this endpoint
        others = [q for q in pts if not np.array_equal(q, pt)]
        seg_hits = 0
        for q in others:
            # does any other ray's segment come within one voxel of v?
            t = np.linspace(0, 1, 64)[:, None]
            seg = ego[None, :] + t * (q - ego)[None, :]
            sv = np.floor(seg / res[None, :]).astype(int)
            if (np.abs(sv - v[None, :]) <= 1).all(axis=1).any():
                seg_hits += 1
        if seg_hits == 0:
            assert passes[tuple(w)] == 0, f"endpoint voxel {v} marked as pass-through"


@pytest.mark.noquick
def test_encoding_partition(prop_cfg):
    """Dense-encoding invariant (reference index map partition, gvom.py:1152-59):
    evidence is free-space only — strictly zero wherever a voxel is occupied,
    both per-scan and after multi-scan combine with decay."""
    cfg = prop_cfg
    terrain = synthetic.composite_terrain()
    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    for i, ego in enumerate([np.array([0.3, -0.2, 1.5]), np.array([1.0, 0.5, 1.55]),
                             np.array([1.8, 1.1, 1.6])]):
        pts = make_scan(terrain, ego, n_az=48, channels=24, cfg=cfg, seed=i, max_range=10.0)
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        grid, ok = pipeline.ingest_scan(cfg, jnp.asarray(pad), jnp.asarray(mask),
                                        jnp.asarray(np.float32(ego)))
        occ = np.asarray(grid.hit) > 0
        # a scan's negative evidence is DERIVED (miss at unoccupied voxels,
        # WorldState.evidence docstring) — the partition invariant per scan
        # is that the derivation is well-formed: misses are non-negative
        ev = np.where(occ, 0, np.asarray(grid.miss))
        assert (ev >= 0).all()
        buf = pipeline.buffer_insert(cfg, buf, grid, ok)
        world, products, _ = pipeline.combine(cfg, buf, world, jnp.asarray(np.float32(ego)))
        w_occ = np.asarray(world.grid.hit) > 0
        w_ev = np.asarray(world.evidence)
        assert (w_ev[w_occ] == 0).all()


def test_moments_additive(prop_cfg):
    """Raw-moment additivity, r5 form. The UNDERLYING neighborhood sums are
    additive — moments(A ∪ B) == moments(A) + moments(B) voxelwise — which is
    what makes fusion a plain add / psum (SURVEY §7); verified at the ops
    level (box_aggregate_moments). The STORED pipeline form is additionally
    occupancy-masked at ingest (reference combine_metrics only ever reads
    metrics where the source voxel is occupied, gvom.py:198-266), so the
    stored arrays agree with the summed halves exactly where both halves are
    occupied, and hit counts stay additive everywhere."""
    cfg = prop_cfg
    terrain = synthetic.composite_terrain()
    ego = np.array([0.3, -0.2, 1.5])
    pts = make_scan(terrain, ego, n_az=64, channels=32, cfg=cfg, max_range=10.0)
    pts = pts[: cfg.max_points - 10]  # all three ingests must fit w/o truncation
    half = len(pts) // 2
    e = jnp.asarray(np.float32(ego))
    origin = gridops.compute_origin(cfg, e)

    def ingest(points):
        pad, mask = synthetic.pad_scan(points, cfg.max_points)
        grid, _ = pipeline.ingest_scan(cfg, jnp.asarray(pad), jnp.asarray(mask), e,
                                       origin=origin)
        return grid

    g_all, g_a, g_b = ingest(pts), ingest(pts[:half]), ingest(pts[half:])
    # compare unpacked channels (the packed layout also has pad lanes)
    from gvom_tpu.ops import binning, moments

    def unpacked(g):
        n, s1, s2 = moments.unpack_moments(g.mom, cfg.z_size)
        return np.concatenate([np.asarray(n)[None], np.asarray(s1), np.asarray(s2)])

    both = (np.asarray(g_a.hit) > 0) & (np.asarray(g_b.hit) > 0)
    np.testing.assert_allclose(
        (unpacked(g_a) + unpacked(g_b))[:, both], unpacked(g_all)[:, both],
        rtol=0, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(g_a.hit) + np.asarray(g_b.hit), np.asarray(g_all.hit))

    # ops-level raw sums (pre-mask) are additive EVERYWHERE
    def raw(points):
        pad, mask = synthetic.pad_scan(points, cfg.max_points)
        p, keep = binning.prepare_points(cfg, jnp.asarray(pad), jnp.asarray(mask), e)
        bins = binning.bin_points(cfg, p, keep, origin)
        n, s1, s2 = moments.box_aggregate_moments(cfg, bins)
        return np.concatenate([np.asarray(n)[None], np.asarray(s1), np.asarray(s2)])

    np.testing.assert_allclose(raw(pts[:half]) + raw(pts[half:]), raw(pts),
                               rtol=0, atol=1e-4)


def test_nonfinite_points_are_dropped(small_cfg):
    """NaN/Inf points (common in real PointCloud2 streams) must be masked out
    by the world-frame distance filter, never corrupt the grid, and a point
    exactly at the ego (zero-length ray) must not raycast."""
    cfg = small_cfg
    ego = np.array([0.3, -0.2, 1.5], np.float32)
    good = ego + np.array([[3.0, 0.5, -1.0], [2.0, -1.5, -0.8]], np.float32)
    bad = np.array(
        [
            [np.nan, 1.0, 1.0],
            [np.inf, 2.0, 0.0],
            [-np.inf, np.nan, np.inf],
            ego,                     # zero-length ray
        ],
        np.float32,
    )
    pts = np.concatenate([good, bad], axis=0)
    pad, mask = synthetic.pad_scan(pts, cfg.max_points)
    grid, ok = pipeline.ingest_scan(
        cfg, jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(ego)
    )
    hit = np.asarray(grid.hit)
    miss = np.asarray(grid.miss)
    assert bool(ok)
    assert np.isfinite(np.asarray(grid.min_height)).all()
    assert np.isfinite(np.asarray(grid.mom)).all()
    # the ego point is kept — the reference's min_distance filter is a
    # world-frame norm (gvom.py:1064), and |ego| > min_distance here — and
    # bins as a zero-length ray (hit, no passes)
    assert hit.sum() == 3
    assert (hit >= 0).all() and (miss >= 0).all()

    keepable = np.concatenate([good, ego[None, :]], axis=0)
    kp, km = synthetic.pad_scan(keepable, cfg.max_points)
    ref_grid, _ = pipeline.ingest_scan(cfg, jnp.asarray(kp), jnp.asarray(km), jnp.asarray(ego))
    np.testing.assert_array_equal(hit, np.asarray(ref_grid.hit))   # non-finite points change nothing
    np.testing.assert_array_equal(miss, np.asarray(ref_grid.miss))
