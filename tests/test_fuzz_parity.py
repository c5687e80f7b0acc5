"""Randomized engine-vs-oracle parity fuzz (SURVEY.md §4 parity harness,
widened): random config variations (asymmetric resolutions, eigen radii,
buffer depth, decay limit) x random terrain mixtures x multi-step drives
with re-origin shifts. Rare-geometry divergences hide here, not in the
hand-picked scenes of test_parity_combine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.io import synthetic
from gvom_tpu.models import pipeline
from gvom_tpu.oracle import NumpyOracle
from gvom_tpu.types import empty_buffer_state, empty_world_state

from helpers import singular_fit_mask


def random_terrain(rng):
    """A random mix of bumps, a wall segment, and a trench."""
    amp = rng.uniform(0.1, 0.5)
    wl = rng.uniform(3.0, 8.0)
    xw = rng.uniform(5.0, 9.0)
    wh = rng.uniform(1.0, 3.0)
    xc = rng.uniform(-9.0, -5.0)
    wd = rng.uniform(1.0, 3.0)
    tw = rng.uniform(1.5, 4.0)
    gx = rng.uniform(-0.15, 0.15)
    gy = rng.uniform(-0.15, 0.15)

    def h(x, y):
        base = gx * x + gy * y + amp * np.sin(2 * np.pi * x / wl) * np.cos(2 * np.pi * y / wl)
        wall = np.where((x > xw) & (x < xw + 0.8) & (np.abs(y) < 6.0), wh, 0.0)
        trench = np.where(np.abs(x - xc) < tw / 2, -wd, 0.0)
        return base + wall + trench

    return synthetic.Terrain(h, "fuzz")


CASES = [
    # (seed, config overrides)
    (11, dict(xy_size=40, z_size=24, xy_resolution=0.35, z_resolution=0.25,
              buffer_size=3, xy_eigen_dist=1, z_eigen_dist=0)),
    (23, dict(xy_size=48, z_size=16, xy_resolution=0.5, z_resolution=0.5,
              buffer_size=2, xy_eigen_dist=2, z_eigen_dist=1, decay_miss_limit=4)),
    (37, dict(xy_size=32, z_size=32, xy_resolution=0.4, z_resolution=0.2,
              buffer_size=5, xy_eigen_dist=0, z_eigen_dist=0, robot_radius=0.8)),
]


@pytest.mark.parametrize("seed,over", CASES)
def test_fuzz_engine_matches_oracle(seed, over):
    rng = np.random.default_rng(seed)
    cfg = GvomConfig(max_points=16384, **over)
    terrain = random_terrain(rng)
    oracle = NumpyOracle(cfg)
    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    combine_j = jax.jit(lambda b, w, e: pipeline.combine(cfg, b, w, e))
    ingest_j = jax.jit(lambda b, p, v, e: pipeline.ingest_and_insert(cfg, b, p, v, e))

    ego = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 1.4 + rng.uniform(0, 0.4)])
    for step in range(4):
        ego = ego + np.array([rng.uniform(0.1, 1.2), rng.uniform(-0.6, 0.6), rng.uniform(-0.05, 0.05)])
        pts = synthetic.simulate_lidar_scan(
            terrain, ego, channels=24, azimuth_steps=96,
            max_range=0.5 * cfg.xy_size * cfg.xy_resolution, seed=seed * 10 + step,
        )
        pts = synthetic.nudge_off_grid(pts, cfg.xy_resolution, cfg.z_resolution)
        oracle.process_pointcloud(pts, ego)
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        buf, _ = ingest_j(buf, jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(np.float32(ego)))
        o_out = oracle.combine_maps()
        world, products, ok = combine_j(buf, world, jnp.asarray(np.float32(ego)))
        assert bool(ok)

        o_origin, o_pos, o_neg, o_rough, o_vis = o_out
        np.testing.assert_array_equal(np.asarray(products.origin), oracle.combined.origin)
        np.testing.assert_allclose(np.asarray(products.height), oracle.height_map, atol=1e-4)
        np.testing.assert_allclose(np.asarray(products.inferred_height),
                                   oracle.inferred_height_map, atol=1e-4)
        np.testing.assert_allclose(np.asarray(products.guessed_height_delta),
                                   oracle.guessed_height_delta, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(products.visibility), o_vis)
        np.testing.assert_array_equal(np.asarray(products.negative_obstacle), o_neg)
        ok_fit = ~singular_fit_mask(oracle.height_map.astype(np.float64), cfg.xy_resolution)
        np.testing.assert_allclose(np.asarray(products.slope_x)[ok_fit],
                                   oracle.x_slope_map[ok_fit], atol=2e-4)
        d = np.abs(np.asarray(products.positive_obstacle) - o_pos)[ok_fit]
        assert d.max() <= 1


@pytest.mark.parametrize("seed,over", CASES)
def test_fuzz_batched_step_mesh_consistency(seed, over):
    """The sharded batched step is mesh-size invariant across fuzz configs:
    two steps with a moving ego drive the sharded torus re-origin + decay
    merge (align_to with slab coords), the riskiest collective path."""
    from gvom_tpu.parallel.mesh import make_mesh
    from gvom_tpu.parallel.sharding import make_batched_step

    rng = np.random.default_rng(seed + 1000)
    cfg = GvomConfig(max_points=4096, **over)
    terrain = random_terrain(rng)

    S = 8
    batches = []
    ego = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 1.5])
    for b in range(2):
        scans, masks, egos = [], [], []
        for i in range(S):
            # big strides so step 2's origin shifts several voxels
            ego = ego + np.array([rng.uniform(0.3, 0.9), rng.uniform(-0.4, 0.4), 0.0])
            pts = synthetic.simulate_lidar_scan(
                terrain, ego, channels=8, azimuth_steps=32,
                max_range=0.4 * cfg.xy_size * cfg.xy_resolution, seed=seed * 100 + b * 10 + i,
            )
            pts = synthetic.nudge_off_grid(pts, cfg.xy_resolution, cfg.z_resolution)
            pad, mask = synthetic.pad_scan(pts, cfg.max_points)
            scans.append(pad)
            masks.append(mask)
            egos.append(ego.astype(np.float32))
        batches.append((jnp.asarray(np.stack(scans)), jnp.asarray(np.stack(masks)),
                        jnp.asarray(np.stack(egos))))

    out = {}
    for ndev in (1, 8):
        mesh = make_mesh(jax.devices()[:ndev])
        step = make_batched_step(cfg, mesh, raycast_impl="xla")
        world = empty_world_state(cfg)
        for scans, masks, egos in batches:
            world, products = step(world, scans, masks, egos)
        out[ndev] = (world, products)

    w1, p1 = out[1]
    w8, p8 = out[8]
    np.testing.assert_array_equal(np.asarray(w1.grid.origin), np.asarray(w8.grid.origin))
    np.testing.assert_array_equal(np.asarray(w1.grid.hit), np.asarray(w8.grid.hit))
    np.testing.assert_array_equal(np.asarray(w1.grid.miss), np.asarray(w8.grid.miss))
    np.testing.assert_array_equal(np.asarray(w1.evidence), np.asarray(w8.evidence))
    np.testing.assert_allclose(np.asarray(w1.grid.min_height), np.asarray(w8.grid.min_height), atol=1e-6)
    # moment sums reduce in a different order on the two meshes (the slab
    # ingest accumulates the ±ry offsets point-wise, the single-device path
    # bins then box-filters; psum order differs too) — f32 noise up to ~1e-4
    # absolute on near-cancelling raw sums, not a bug
    np.testing.assert_allclose(np.asarray(w1.grid.mom), np.asarray(w8.grid.mom), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(p1.visibility), np.asarray(p8.visibility))
    np.testing.assert_allclose(np.asarray(p1.height), np.asarray(p8.height), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(p1.negative_obstacle), np.asarray(p8.negative_obstacle))
