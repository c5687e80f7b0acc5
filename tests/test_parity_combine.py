"""Engine vs oracle parity for multi-scan fusion + all 2D map products.

Covers: ring-buffer slot-order fusion, moving-ego re-origin shifts, the
previous-map decay veto, and the five output maps plus intermediates
(BASELINE configs #1/#2 semantics on a small grid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvom_tpu.io import synthetic
from gvom_tpu.models import pipeline
from gvom_tpu.oracle import NumpyOracle
from gvom_tpu.types import UNKNOWN_HEIGHT, empty_buffer_state, empty_world_state

from conftest import make_scan
from helpers import singular_fit_mask


def run_pair(cfg, egos, terrain, n_combines_between=1):
    """Feed the same scan sequence through oracle and engine; combine after
    every scan; return lists of (oracle outputs, engine products)."""
    oracle = NumpyOracle(cfg)
    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    combine_j = jax.jit(lambda b, w, e: pipeline.combine(cfg, b, w, e))
    ingest_j = jax.jit(lambda b, p, v, e: pipeline.ingest_and_insert(cfg, b, p, v, e))

    results = []
    for i, ego in enumerate(egos):
        pts = make_scan(terrain, ego, seed=i, cfg=cfg)
        o_out = None
        oracle.process_pointcloud(pts, ego)
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        buf, _ = ingest_j(buf, jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(np.float32(ego)))
        o_out = oracle.combine_maps()
        world, products, ok = combine_j(buf, world, jnp.asarray(np.float32(ego)))
        assert bool(ok)
        snap = dict(
            origin=oracle.combined.origin.copy(),
            height=oracle.height_map.copy(),
            inferred=oracle.inferred_height_map.copy(),
            slope_x=oracle.x_slope_map.copy(),
            slope_y=oracle.y_slope_map.copy(),
            rough=oracle.roughness_map.copy(),
            ghd=oracle.guessed_height_delta.copy(),
        )
        results.append((snap, o_out, products))
    return results


@pytest.fixture(scope="module")
def runs(small_cfg):
    egos = [
        np.array([0.3, -0.2, 1.5]),
        np.array([1.1, 0.4, 1.55]),
        np.array([2.2, 1.0, 1.6]),
        np.array([3.5, 1.8, 1.62]),
        np.array([4.9, 2.9, 1.7]),
    ]
    return run_pair(small_cfg, egos, synthetic.composite_terrain())


def test_origin_and_counts(runs, small_cfg):
    for snap, o_out, products in runs:
        np.testing.assert_array_equal(np.asarray(products.origin), snap["origin"])


def test_height_map(runs):
    for snap, o_out, products in runs:
        np.testing.assert_allclose(np.asarray(products.height), snap["height"], atol=1e-4)


def test_inferred_height_map(runs):
    for snap, o_out, products in runs:
        np.testing.assert_allclose(np.asarray(products.inferred_height), snap["inferred"], atol=1e-4)


def test_slope_and_roughness(runs, small_cfg):
    for snap, o_out, products in runs:
        ok = ~singular_fit_mask(snap["height"], small_cfg.xy_resolution)
        np.testing.assert_allclose(np.asarray(products.slope_x)[ok], snap["slope_x"][ok], atol=2e-4)
        np.testing.assert_allclose(np.asarray(products.slope_y)[ok], snap["slope_y"][ok], atol=2e-4)
        eng_r = np.asarray(products.roughness)
        ora_r = snap["rough"]
        # log of a tiny MSE amplifies f32/f64 differences; compare where defined
        both = ok & (eng_r > -1) & (ora_r > -1)
        np.testing.assert_allclose(eng_r[both], ora_r[both], atol=0.08)
        assert ((eng_r == -1) == (ora_r == -1))[ok].mean() > 0.999


def test_guessed_height_delta(runs):
    for snap, o_out, products in runs:
        np.testing.assert_allclose(
            np.asarray(products.guessed_height_delta), snap["ghd"], atol=1e-4
        )


def test_five_outputs(runs, small_cfg):
    for snap, o_out, products in runs:
        o_origin, o_pos, o_neg, o_rough, o_vis = o_out
        np.testing.assert_array_equal(np.asarray(products.visibility), o_vis)
        np.testing.assert_array_equal(np.asarray(products.negative_obstacle), o_neg)
        ok = ~singular_fit_mask(snap["height"], small_cfg.xy_resolution)
        pos = np.asarray(products.positive_obstacle)
        # density is int(frac*100); f32 vs f64 can flip a unit at exact boundaries
        d = np.abs(pos - o_pos)[ok]
        assert d.max() <= 1, f"max pos diff {d.max()} on well-conditioned cells"
        assert (d > 0).mean() < 0.01


def test_transform_argument_parity(small_cfg):
    """The sensor→world transform path (reference __transform_pointcloud,
    gvom.py:1038-1056, applied before the world-frame min_distance filter):
    engine and oracle agree through a rigid transform. The transform uses
    0/±1 rotation entries and dyadic translations so f32 (engine) and f64
    (oracle) arithmetic agree bitwise."""
    ego = np.array([0.3, -0.2, 1.5])
    pts_world = make_scan(synthetic.composite_terrain(), ego, cfg=small_cfg)
    # sensor frame: world = R @ sensor + t  with exact-in-f32 entries
    R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    t = np.array([2.25, -1.5, 0.5])
    tf = np.eye(4)
    tf[:3, :3] = R
    tf[:3, 3] = t
    pts_sensor = (pts_world - t) @ R  # R^-1 = R.T applied on the right

    oracle = NumpyOracle(small_cfg)
    sm_ref = oracle.process_pointcloud(pts_world, ego)
    oracle2 = NumpyOracle(small_cfg)
    sm_tf = oracle2.process_pointcloud(pts_sensor, ego, transform=tf)
    np.testing.assert_array_equal(sm_ref.hit, sm_tf.hit)  # oracle self-consistency

    pad, mask = synthetic.pad_scan(pts_sensor, small_cfg.max_points)
    grid, ok = pipeline.ingest_scan(
        small_cfg, jnp.asarray(pad.astype(np.float32)), jnp.asarray(mask),
        jnp.asarray(np.float32(ego)), jnp.asarray(tf.astype(np.float32)),
    )
    assert bool(ok)
    from helpers import canonical
    np.testing.assert_array_equal(canonical(grid.hit, sm_tf.origin), sm_tf.hit)
    np.testing.assert_array_equal(canonical(grid.miss, sm_tf.origin), sm_tf.passes)
