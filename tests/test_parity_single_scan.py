"""Engine vs NumPy-oracle parity for a single scan's voxel map.

BASELINE config #1: single synthetic scan → process + combine on a small grid,
validated against the reference-semantics oracle (SURVEY.md §4 golden-model
strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast inner-loop tier (see pyproject markers)

from gvom_tpu.io import synthetic
from gvom_tpu.models import pipeline
from gvom_tpu.ops import moments
from gvom_tpu.oracle import NumpyOracle

from conftest import make_scan
from helpers import canonical


@pytest.fixture(scope="module")
def pair(small_cfg):
    ego = np.array([0.3, -0.2, 1.5])
    pts = make_scan(synthetic.composite_terrain(), ego, cfg=small_cfg)
    oracle = NumpyOracle(small_cfg)
    sm = oracle.process_pointcloud(pts, ego)
    assert sm is not None

    pad, mask = synthetic.pad_scan(pts, small_cfg.max_points)
    grid, ok = pipeline.ingest_scan(
        small_cfg, jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(ego.astype(np.float32))
    )
    assert bool(ok)
    return small_cfg, sm, grid


def test_origin(pair):
    cfg, sm, grid = pair
    np.testing.assert_array_equal(np.asarray(grid.origin), sm.origin)


def test_hit_counts_exact(pair):
    cfg, sm, grid = pair
    np.testing.assert_array_equal(canonical(grid.hit, sm.origin), sm.hit)


def test_pass_counts_exact(pair):
    cfg, sm, grid = pair
    np.testing.assert_array_equal(canonical(grid.miss, sm.origin), sm.passes)


def test_min_height(pair):
    cfg, sm, grid = pair
    occ = sm.hit > 0
    np.testing.assert_allclose(canonical(grid.min_height, sm.origin)[occ], sm.min_height[occ], atol=1e-5)


def test_moment_count(pair):
    cfg, sm, grid = pair
    occ = sm.hit > 0
    n, _, _ = moments.unpack_moments(grid.mom, cfg.z_size)
    np.testing.assert_allclose(canonical(n, sm.origin)[occ], sm.n[occ], rtol=1e-6)


def test_covariance(pair):
    cfg, sm, grid = pair
    occ = sm.hit > 0
    n, s1, s2 = moments.unpack_moments(grid.mom, cfg.z_size)
    cov_engine = canonical(moments.covariance(n, s1, s2), sm.origin)
    cov_oracle = np.moveaxis(sm.cov, -1, 0)
    np.testing.assert_allclose(cov_engine[:, occ], cov_oracle[:, occ], atol=2e-4)


def test_local_mean(pair):
    cfg, sm, grid = pair
    occ = sm.hit > 0
    # engine stores raw voxel-local sums; normalize to the oracle's mean
    n, s1, _ = moments.unpack_moments(grid.mom, cfg.z_size)
    eng_local = canonical(moments.mean_local(n, s1), sm.origin)[:, occ]
    ora_local = np.moveaxis(sm.mean, -1, 0)[:, occ]
    np.testing.assert_allclose(eng_local, ora_local, atol=1e-4)
