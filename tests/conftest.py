"""Test harness configuration.

Forces an 8-device virtual CPU platform (SURVEY.md §4: multi-device tests
without a pod) — must run before jax imports anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU: the environment's TPU plugin prepends itself to jax_platforms
# regardless of JAX_PLATFORMS (and its first compile costs minutes through the
# tunnel). Parity tests must run engine and oracle on the same backend anyway
# for bit-stable floats.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gvom_tpu.config import GvomConfig  # noqa: E402
from gvom_tpu.io import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> GvomConfig:
    """Small grid: fast oracle, full semantics."""
    return GvomConfig(xy_size=64, z_size=32, max_points=4096, buffer_size=3)


def make_scan(terrain, ego, n_az=64, channels=32, seed=0, cfg=None, max_range=25.0):
    pts = synthetic.simulate_lidar_scan(
        terrain, ego, channels=channels, azimuth_steps=n_az, max_range=max_range, seed=seed
    )
    if cfg is not None:
        pts = synthetic.nudge_off_grid(pts, cfg.xy_resolution, cfg.z_resolution)
    return pts


@pytest.fixture(scope="session")
def flat_scan(small_cfg):
    ego = np.array([0.3, -0.2, 1.5])
    return make_scan(synthetic.composite_terrain(), ego, cfg=small_cfg), ego
