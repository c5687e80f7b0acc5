"""Facade-level parity for the planner/debug export surface: occupancy grid
(gvom.py:356-361) and the three debug point-cloud exporters (gvom.py:363-410),
engine vs the reference-semantics oracle."""

import numpy as np
import pytest

from gvom_tpu.engine.gvom import Gvom
from gvom_tpu.io import synthetic
from gvom_tpu.oracle import NumpyOracle

from conftest import make_scan
from helpers import singular_fit_mask


@pytest.fixture(scope="module")
def facades(small_cfg):
    engine = Gvom(config=small_cfg)
    oracle = NumpyOracle(small_cfg)
    egos = [
        np.array([0.3, -0.2, 1.5]),
        np.array([1.1, 0.4, 1.55]),
        np.array([2.2, 1.0, 1.6]),
        np.array([3.5, 1.8, 1.62]),
    ]
    for i, ego in enumerate(egos):
        pts = make_scan(synthetic.composite_terrain(), ego, seed=i, cfg=small_cfg)
        engine.process_pointcloud(pts, ego)
        oracle.process_pointcloud(pts, ego)
    assert engine.combine_maps() is not None
    assert oracle.combine_maps() is not None
    return small_cfg, engine, oracle


def test_occupancy_grid(facades):
    cfg, engine, oracle = facades
    np.testing.assert_array_equal(
        engine.get_map_as_occupancy_grid(), oracle.get_map_as_occupancy_grid()
    )


def test_debug_voxel_map(facades):
    cfg, engine, oracle = facades
    eng = engine.make_debug_voxel_map()
    ora = oracle.make_debug_voxel_map()
    assert eng.shape == ora.shape  # same occupancy ⇒ same row count/order
    np.testing.assert_allclose(eng[:, :3], ora[:, :3], atol=1e-5)   # world xyz
    np.testing.assert_allclose(eng[:, 3], ora[:, 3], atol=1e-6)     # hit density
    np.testing.assert_array_equal(eng[:, 4], ora[:, 4])             # hit count
    # eigen features: f32 trig closed form vs the oracle's f64
    np.testing.assert_allclose(eng[:, 5:], ora[:, 5:], atol=2e-3)


def test_debug_height_map(facades):
    cfg, engine, oracle = facades
    eng = engine.make_debug_height_map()
    ora = oracle.make_debug_height_map()
    assert eng.shape == ora.shape
    np.testing.assert_allclose(eng[:, :3], ora[:, :3], atol=1e-4)   # xy + height
    ok = ~singular_fit_mask(
        oracle.height_map.astype(np.float64), cfg.xy_resolution
    ).ravel(order="F")  # rows are x + y*X — Fortran ravel of the [X,X] maps
    np.testing.assert_allclose(eng[ok, 4:], ora[ok, 4:], atol=2e-4)  # slopes
    both = ok & (eng[:, 3] > -1) & (ora[:, 3] > -1)
    np.testing.assert_allclose(eng[both, 3], ora[both, 3], atol=0.08)  # roughness


def test_debug_inferred_height_map(facades):
    cfg, engine, oracle = facades
    eng = engine.make_debug_inferred_height_map()
    ora = oracle.make_debug_inferred_height_map()
    assert eng.shape == ora.shape
    np.testing.assert_allclose(eng, ora, atol=1e-4)


def test_debug_voxel_eigen_parity_reference_grid():
    """Eigen-feature parity at the REFERENCE grid size (256×256×64).

    The reference computes K16 eigenvalues every combine (gvom.py:276-284)
    but only the debug voxel cloud ever reads them (G:363-378); gvom_tpu
    evaluates them lazily at this exporter (PARITY.md "Contract decisions").
    This pins that deferred path against the oracle at full grid scale, not
    just the small grids the rest of the suite uses."""
    from gvom_tpu.config import GvomConfig

    cfg = GvomConfig(max_points=16384)          # full 256×256×64 grid
    engine = Gvom(config=cfg)
    oracle = NumpyOracle(cfg)
    ego = np.array([0.5, 0.3, 1.6])
    pts = synthetic.simulate_lidar_scan(
        synthetic.composite_terrain(), ego, channels=16, azimuth_steps=1024,
        max_range=50.0, seed=7,
    )
    pts = synthetic.nudge_off_grid(pts, cfg.xy_resolution, cfg.z_resolution)
    engine.process_pointcloud(pts, ego)
    oracle.process_pointcloud(pts, ego)
    assert engine.combine_maps() is not None
    assert oracle.combine_maps() is not None
    eng = engine.make_debug_voxel_map()
    ora = oracle.make_debug_voxel_map()
    assert eng.shape == ora.shape and eng.shape[0] > 1000
    np.testing.assert_allclose(eng[:, :3], ora[:, :3], atol=1e-4)
    np.testing.assert_array_equal(eng[:, 4], ora[:, 4])
    np.testing.assert_allclose(eng[:, 5:], ora[:, 5:], atol=2e-3)
