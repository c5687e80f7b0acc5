"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU;
the same kernels compile for TPU — see scratch/ benchmarks and bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gvom_tpu.io import synthetic
from gvom_tpu.ops import binning, moments, raycast
from gvom_tpu.ops import grid as gridops
from gvom_tpu.ops import pallas_kernels
from gvom_tpu.ops.pallas_kernels import fused_point_moments, ray_pass_counts_matmul

from conftest import make_scan
from helpers import canonical


@pytest.fixture(scope="module")
def scene(small_cfg):
    ego = np.array([0.3, -0.2, 1.5])
    pts = make_scan(synthetic.composite_terrain(), ego, cfg=small_cfg)
    pad, mask = synthetic.pad_scan(pts, small_cfg.max_points)
    p = jnp.asarray(pad)
    v = jnp.asarray(mask)
    e = jnp.asarray(np.float32(ego))
    pw, keep = binning.prepare_points(small_cfg, p, v, e)
    origin = gridops.compute_origin(small_cfg, e)
    return small_cfg, pw, keep, e, origin


def test_raycast_matmul_exact(scene):
    cfg, pw, keep, e, origin = scene
    ref = np.asarray(jax.jit(lambda: raycast.ray_pass_counts_xla(cfg, pw, keep, e, origin))())
    mm = np.asarray(
        jax.jit(lambda: ray_pass_counts_matmul(cfg, pw, keep, e, origin, interpret=True))()
    )
    np.testing.assert_array_equal(mm, ref)  # both torus layout
    assert ref.sum() > 0


def test_raycast_matmul_widened_budget():
    """The batched sharded step widens ray_steps to the any-in-grid bound
    (ego off-center in a foreign frame); the step-block tiling must stay
    exact at that larger S."""
    import dataclasses

    from gvom_tpu.config import GvomConfig

    cfg0 = GvomConfig(xy_size=32, z_size=16, max_points=1024)
    cfg = dataclasses.replace(cfg0, ray_steps_override=max(cfg0.xy_size, cfg0.z_size) + 4)
    ego_near = np.array([0.3, -0.2, 1.5], np.float32)
    ego_far = ego_near + np.array([cfg.xy_size * cfg.xy_resolution * 0.45, 0.0, 0.0], np.float32)
    pts = synthetic.simulate_lidar_scan(
        synthetic.composite_terrain(), ego_near, channels=8, azimuth_steps=32, max_range=14.0, seed=3
    )
    pad, mask = synthetic.pad_scan(pts, cfg.max_points)
    e = jnp.asarray(ego_near)
    origin = gridops.compute_origin(cfg, jnp.asarray(ego_far))
    pw, keep = binning.prepare_points(cfg, jnp.asarray(pad), jnp.asarray(mask), e)
    ref = np.asarray(jax.jit(lambda: raycast.ray_pass_counts_xla(cfg, pw, keep, e, origin))())
    mm = np.asarray(
        jax.jit(lambda: ray_pass_counts_matmul(cfg, pw, keep, e, origin, interpret=True))()
    )
    np.testing.assert_array_equal(mm, ref)
    assert ref.sum() > 0


def test_raycast_matmul_empty(scene):
    cfg, pw, keep, e, origin = scene
    none = jnp.zeros_like(keep)
    mm = np.asarray(
        jax.jit(lambda: ray_pass_counts_matmul(cfg, pw, none, e, origin, interpret=True))()
    )
    assert mm.sum() == 0


def test_fused_moments_matches_scatter_path(scene):
    cfg, pw, keep, e, origin = scene
    bins = jax.jit(lambda: binning.bin_points(cfg, pw, keep, origin))()
    n0, s1_0, s2_0 = jax.jit(lambda: moments.box_aggregate_moments(cfg, bins))()
    hit, mh1, mom = jax.jit(
        lambda: fused_point_moments(cfg, pw, keep, origin, interpret=True)
    )()
    n1, s1_1, s2_1 = moments.unpack_moments(mom, cfg.z_size)
    # bins.hit is torus; box-aggregate outputs are window layout
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bins.hit))
    np.testing.assert_allclose(np.asarray(mh1), np.asarray(bins.min_height), atol=1e-6)
    n1c = canonical(n1, origin); s1c = canonical(s1_1, origin); s2c = canonical(s2_1, origin)
    occ = canonical(bins.hit, origin) > 0
    np.testing.assert_allclose(n1c[occ], np.asarray(n0)[occ], atol=1e-3)
    np.testing.assert_allclose(s1c[:, occ], np.asarray(s1_0)[:, occ], rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(s2c[:, occ], np.asarray(s2_0)[:, occ], rtol=1e-5, atol=2e-3)


def test_fused_moments_border_points(small_cfg):
    """Points just outside the grid still feed border voxels' moments
    (gvom.py:1184-1202 has no base bounds check)."""
    cfg = small_cfg
    res = np.array([cfg.xy_resolution, cfg.xy_resolution, cfg.z_resolution])
    origin = jnp.asarray(np.array([0, 0, 0], np.int32))
    # one point inside the border voxel, one just outside the grid
    pts = np.array(
        [
            [0.5 * res[0], 0.5 * res[1], 0.5 * res[2]],
            [-0.5 * res[0], 0.5 * res[1], 0.5 * res[2]],
        ],
        np.float32,
    )
    pad = np.zeros((cfg.max_points, 3), np.float32)
    pad[:2] = pts
    keep = np.zeros((cfg.max_points,), bool)
    keep[:2] = True
    p = jnp.asarray(pad)
    k = jnp.asarray(keep)
    bins = jax.jit(lambda: binning.bin_points(cfg, p, k, origin))()
    n0, _, _ = jax.jit(lambda: moments.box_aggregate_moments(cfg, bins))()
    _, _, mom = jax.jit(lambda: fused_point_moments(cfg, p, k, origin, interpret=True))()
    n1, _, _ = moments.unpack_moments(mom, cfg.z_size)
    assert float(n0[0, 0, 0]) == 2.0  # both points reach voxel (0,0,0)
    assert float(canonical(n1, origin)[0, 0, 0]) == 2.0


@pytest.mark.parametrize("xye,ze", [(0, 0), (2, 1)])
def test_fused_moments_eigen_radii(xye, ze):
    """The fused kernel's box aggregation must match the scatter path at
    non-default covariance support radii (gvom.py:47-51: xy/z_eigen_dist),
    which change the moment_pad extents and the separable box size."""
    import dataclasses

    from gvom_tpu.config import GvomConfig

    cfg = GvomConfig(
        xy_size=32, z_size=16, max_points=2048, xy_eigen_dist=xye, z_eigen_dist=ze
    )
    ego = np.array([0.3, -0.2, 1.5])
    pts = make_scan(synthetic.composite_terrain(), ego, n_az=48, channels=16, cfg=cfg, max_range=10.0)
    pad, mask = synthetic.pad_scan(pts, cfg.max_points)
    e = jnp.asarray(np.float32(ego))
    pw, keep = binning.prepare_points(cfg, jnp.asarray(pad), jnp.asarray(mask), e)
    origin = gridops.compute_origin(cfg, e)

    bins = jax.jit(lambda: binning.bin_points(cfg, pw, keep, origin))()
    n0, s1_0, s2_0 = jax.jit(lambda: moments.box_aggregate_moments(cfg, bins))()
    hit, mh, mom = jax.jit(lambda: fused_point_moments(cfg, pw, keep, origin, interpret=True))()
    n1, s1_1, s2_1 = moments.unpack_moments(mom, cfg.z_size)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bins.hit))
    occ = canonical(bins.hit, origin) > 0
    np.testing.assert_allclose(canonical(n1, origin)[occ], np.asarray(n0)[occ], atol=1e-3)
    np.testing.assert_allclose(canonical(s1_1, origin)[:, occ], np.asarray(s1_0)[:, occ], rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(canonical(s2_1, origin)[:, occ], np.asarray(s2_0)[:, occ], rtol=1e-5, atol=2e-3)


@pytest.mark.parametrize(
    "idx_dt,val_dt",
    [pytest.param("int16", "int8", marks=pytest.mark.archival),  # non-default knob combo
     ("int32", "bfloat16")],
)
def test_kernel_dtype_variants_exact(scene, monkeypatch, idx_dt, val_dt):
    """The patchable one-hot dtypes (int16 compares pack 2/lane; bf16 matmul
    operands hit the MXU natively) must stay exact — these are the variants
    the TPU tuning harness flips (scratch/raymicro.py, scratch/mommicro.py)."""
    import gvom_tpu.ops.pallas_kernels as pk

    cfg, pw, keep, e, origin = scene
    monkeypatch.setattr(pk, "_OH_IDX", getattr(jnp, idx_dt))
    monkeypatch.setattr(pk, "_OH_VAL", getattr(jnp, val_dt))
    ref = np.asarray(jax.jit(lambda: raycast.ray_pass_counts_xla(cfg, pw, keep, e, origin))())
    mm = np.asarray(pk.ray_pass_counts_matmul(cfg, pw, keep, e, origin, interpret=True))
    np.testing.assert_array_equal(mm, ref)

    bins = jax.jit(lambda: binning.bin_points(cfg, pw, keep, origin))()
    hit, _, mom = pk.fused_point_moments(cfg, pw, keep, origin, interpret=True)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bins.hit))
    n0, _, _ = jax.jit(lambda: moments.box_aggregate_moments(cfg, bins))()
    n1, _, _ = moments.unpack_moments(mom, cfg.z_size)
    occ = canonical(bins.hit, origin) > 0
    np.testing.assert_allclose(canonical(n1, origin)[occ], np.asarray(n0)[occ], atol=1e-3)


@pytest.mark.parametrize(
    "tier64",
    [False, True,
     pytest.param("steppair", marks=pytest.mark.archival)],  # r4 measured dead end
)
def test_raycast_window_tiers_exact(scene, monkeypatch, tier64):
    """The windowed near tiers stay exact vs the XLA path on a 256-wide grid:
    the r4 step-paired mod-64 default (two steps per matmul row, quadrant
    extraction), the r3 group-paired GVOM_RAY_TIER64 layout (mod-64 steps
    1..31, mod-128 32..63, far), and the plain mod-128 fallback."""
    import dataclasses

    import gvom_tpu.ops.pallas_kernels as pk
    from gvom_tpu.config import GvomConfig

    cfg = GvomConfig(xy_size=256, z_size=32, max_points=4096)
    ego = np.array([0.3, -0.2, 1.5])
    pts = make_scan(synthetic.composite_terrain(), ego, n_az=64, channels=16,
                    cfg=cfg, max_range=45.0)
    pad, mask = synthetic.pad_scan(pts, cfg.max_points)
    e = jnp.asarray(np.float32(ego))
    pw, keep = binning.prepare_points(cfg, jnp.asarray(pad), jnp.asarray(mask), e)
    origin = gridops.compute_origin(cfg, e)
    ref = np.asarray(jax.jit(lambda: raycast.ray_pass_counts_xla(cfg, pw, keep, e, origin))())
    monkeypatch.setattr(pk, "_RAY_STEPPAIR", tier64 == "steppair")
    monkeypatch.setattr(pk, "_RAY_TIER64", tier64 is True)
    mm = np.asarray(pk.ray_pass_counts_matmul(cfg, pw, keep, e, origin, interpret=True))
    np.testing.assert_array_equal(mm, ref)
    assert ref.sum() > 0


def test_raycast_matmul_z_dominant(scene):
    """Near-vertical rays (|dz| > |dx|,|dy|) route through the z-dominant
    kernel groups (4/5), which lidar-scan fixtures barely exercise."""
    cfg, _, _, e, origin = scene
    rng = np.random.default_rng(7)
    n = 256
    # endpoints mostly straight down/up from the ego with small xy jitter
    dx = rng.uniform(-0.3, 0.3, n)
    dy = rng.uniform(-0.3, 0.3, n)
    dz = np.where(rng.random(n) < 0.5, -1.0, 1.0) * rng.uniform(2.0, 5.0, n)
    pts = np.asarray(e)[None, :] + np.stack([dx, dy, dz], axis=1)
    pad = np.zeros((cfg.max_points, 3), np.float32)
    pad[:n] = pts
    keep = np.zeros((cfg.max_points,), bool)
    keep[:n] = True
    pw, kp = binning.prepare_points(cfg, jnp.asarray(pad), jnp.asarray(keep), e)
    ref = np.asarray(jax.jit(lambda: raycast.ray_pass_counts_xla(cfg, pw, kp, e, origin))())
    mm = np.asarray(ray_pass_counts_matmul(cfg, pw, kp, e, origin, interpret=True))
    np.testing.assert_array_equal(mm, ref)
    assert ref.sum() > 0


def test_xbox_epilogue_matches_xla_translate():
    """The pallas x-box epilogue (one-HBM-pass translate + slot-5 split,
    the real-TPU path in fused_point_moments) is bit-identical to the XLA
    _xbox_translate_packed form it replaces, including the x-crop and the
    empty-voxel min-height sentinel."""
    rng = np.random.default_rng(11)
    X, rx, Z = 32, 1, 16
    U, V = 24, 2 * Z
    out = rng.normal(size=(X + 2 * rx, 6, U, V)).astype(np.float32)
    out[:, 5, :, Z:] = np.floor(np.abs(out[:, 5, :, Z:]) * 2.0)  # integer hits
    out = jnp.asarray(out)
    mom_p, hit_p, minh_p = pallas_kernels._xbox_epilogue(out, rx, Z, X, interpret=True)
    mom_x, rM = pallas_kernels._xbox_translate_packed(out, rx, Z, X)
    # r5: the epilogue occupancy-pre-masks the moments in-kernel; apply the
    # identical mask to the XLA translate reference
    hit_ref = rM[..., Z: 2 * Z].astype(jnp.int32)
    hm_ = hit_ref > 0
    mom_x = jnp.where(jnp.concatenate([hm_, hm_], axis=-1)[:, None], mom_x, 0.0)
    hit_x = rM[..., Z: 2 * Z].astype(jnp.int32)
    minh_x = jnp.where(hit_x > 0, rM[..., :Z], 1.0)
    np.testing.assert_array_equal(np.asarray(mom_p), np.asarray(mom_x))
    np.testing.assert_array_equal(np.asarray(hit_p), np.asarray(hit_x))
    np.testing.assert_array_equal(np.asarray(minh_p), np.asarray(minh_x))


@pytest.mark.parametrize("ys0_frac", [0, 1, 3])
def test_fused_moments_slab_equals_full_slice(scene, ys0_frac):
    """Slab-windowed fused_point_moments (the Pallas side of the sharded
    slab ingest, SURVEY §2.3 item 2) must equal the full-grid kernel's slab
    columns exactly — including the point prefilter, which may only drop
    points that contribute NOTHING to the slab."""
    cfg, pw, keep, e, origin = scene
    Y = cfg.xy_size
    Ys = Y // 4
    ys0 = ys0_frac * Ys
    hit_f, mh_f, mom_f = jax.jit(
        lambda: fused_point_moments(cfg, pw, keep, origin, interpret=True)
    )()
    hit_s, mh_s, mom_s = jax.jit(
        lambda: fused_point_moments(cfg, pw, keep, origin, interpret=True,
                                    y_window=(ys0, Ys))
    )()
    assert hit_s.shape == (cfg.xy_size, Ys, cfg.z_size)
    np.testing.assert_array_equal(np.asarray(hit_s), np.asarray(hit_f)[:, ys0:ys0 + Ys])
    np.testing.assert_array_equal(np.asarray(mh_s), np.asarray(mh_f)[:, ys0:ys0 + Ys])
    # counts/min are one-hot-exact; the nine f32 moment sums shift by an ulp
    # because the prefilter moves chunk boundaries (different f32 add order —
    # dropped points themselves contribute exactly zero to slab columns)
    np.testing.assert_allclose(np.asarray(mom_s), np.asarray(mom_f)[:, :, ys0:ys0 + Ys],
                               rtol=1e-6, atol=1e-4)
    assert int(np.asarray(hit_s).sum()) > 0 or ys0_frac != 0


@pytest.mark.parametrize("ys0_frac", [0, 1, 3])
def test_raycast_matmul_slab_equals_xla_slab(scene, ys0_frac):
    """Slab-windowed matmul raycast (slab one-hot targets for x/z-dominant
    groups + the relabeled slab-row worklist for y-dominant ones) must equal
    the XLA slab path bitwise — and the full-grid slice, closing SURVEY
    §2.3 item 2's Pallas gap."""
    cfg, pw, keep, e, origin = scene
    Y = cfg.xy_size
    Ys = Y // 4
    ys0 = ys0_frac * Ys
    ref = np.asarray(jax.jit(
        lambda: raycast.ray_pass_counts_xla(cfg, pw, keep, e, origin, y_window=(ys0, Ys))
    )())
    mm = np.asarray(jax.jit(
        lambda: ray_pass_counts_matmul(cfg, pw, keep, e, origin, interpret=True,
                                       y_window=(ys0, Ys))
    )())
    assert mm.shape == (cfg.xy_size, Ys, cfg.z_size)
    np.testing.assert_array_equal(mm, ref)
    full = np.asarray(jax.jit(
        lambda: ray_pass_counts_matmul(cfg, pw, keep, e, origin, interpret=True)
    )())
    np.testing.assert_array_equal(mm, full[:, ys0:ys0 + Ys])


def test_raycast_knife_edge_dominant_row_exact():
    """Knife-edge start: start_rel_dom a half-ulp below an integer, so that
    at some step the f32 sum start+s crosses a binade and rounds UP to the
    integer — f32 flooring would then place that step's histogram one
    dominant row off. All paths use the integer convention floor(start)±s
    (the exact real-number row), so XLA, the matmul kernel's block-write
    placement, and a literal integer-march recomputation must agree.

    Construction: res=1 so start=ego exactly; explicit origin 0 so the
    origin fold doesn't re-round; start_x = fl32(5 − 2⁻²⁰) (representable:
    ulp(5⁻)=2⁻²¹). At s=27, 4.99999905+27 = 31.99999905 is within a half-ulp
    of 32 (ulp(32⁻)=2⁻¹⁸) → the f32 sum is exactly 32.0, floor 32; the true
    row is 4+27=31."""
    import dataclasses

    from gvom_tpu.config import GvomConfig

    cfg = GvomConfig(xy_size=64, z_size=32, max_points=256,
                     xy_resolution=1.0, z_resolution=1.0)
    ex = np.float32(5.0) - np.float32(2.0 ** -20)
    assert float(ex) != 5.0 and float(np.float32(ex + np.float32(27.0))) == 32.0
    ego = np.array([ex, 10.0, 5.0], np.float32)
    origin = jnp.zeros((3,), jnp.int32)
    # one +x-dominant ray long enough to march past the knife-edge step
    pts = np.zeros((cfg.max_points, 3), np.float32)
    pts[0] = ego + np.array([50.0, 2.0, 1.0], np.float32)
    keep = np.zeros((cfg.max_points,), bool)
    keep[0] = True
    p, k, e = jnp.asarray(pts), jnp.asarray(keep), jnp.asarray(ego)

    ref = np.asarray(jax.jit(lambda: raycast.ray_pass_counts_xla(cfg, p, k, e, origin))())
    mm = np.asarray(
        jax.jit(lambda: ray_pass_counts_matmul(cfg, p, k, e, origin, interpret=True))()
    )
    np.testing.assert_array_equal(mm, ref)

    # literal integer-convention march of the single ray
    start, step, delta, budget, dom = jax.jit(
        lambda: raycast.ray_geometry(cfg, p, k, e)
    )()
    start, step = np.asarray(start), np.asarray(step)[0]
    delta, budget = float(np.asarray(delta)[0]), float(np.asarray(budget)[0])
    assert int(np.asarray(dom)[0]) == 0 and step[0] == 1.0
    expected = np.zeros((cfg.xy_size, cfg.xy_size, cfg.z_size), np.int64)
    x0 = int(np.floor(start[0]))
    s = 1
    while (s <= cfg.ray_steps
           and np.float32(np.float32(s - 1) * np.float32(delta)) < np.float32(budget)):
        x = x0 + s                                       # integer convention
        y = int(np.floor(np.float32(start[1]) + np.float32(np.float32(s) * step[1])))
        z = int(np.floor(np.float32(start[2]) + np.float32(np.float32(s) * step[2])))
        if not (0 <= x < cfg.xy_size and 0 <= y < cfg.xy_size and 0 <= z < cfg.z_size):
            break
        expected[x, y, z] += 1
        s += 1
    np.testing.assert_array_equal(ref, expected)
    # the knife-edge step landed on the true row (31), not the f32-floor row
    assert expected[x0 + 27].sum() == 1


def test_fused_ingest_insert_matches_plain():
    """The TPU fast ingest+insert (slot-direct mom epilogue,
    pipeline._ingest_and_insert_fused) is bitwise-identical to
    ingest_scan + buffer_insert on every buffer channel, including the
    degenerate-scan write-off slot."""
    from gvom_tpu.config import GvomConfig
    from gvom_tpu.models import pipeline
    from gvom_tpu.types import empty_buffer_state

    cfg = GvomConfig(xy_size=64, z_size=32, max_points=4096, buffer_size=3)
    terrain = synthetic.composite_terrain()
    ego = np.array([0.3, -0.2, 1.5])
    buf_a = empty_buffer_state(cfg)
    buf_b = empty_buffer_state(cfg)
    for seed in range(3):
        ego = ego + np.array([0.4, 0.2, 0.0])
        pts = make_scan(terrain, ego, n_az=48, channels=16, seed=seed, cfg=cfg)
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        if seed == 1:
            mask = np.zeros_like(mask)          # degenerate scan → slot B
        p, m, e = jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(np.float32(ego))
        # reference: the SAME (interpret-mode) moments kernel without the
        # slot-direct write, through the plain functional insert
        from gvom_tpu.types import VoxelGrid

        pw, keep = binning.prepare_points(cfg, p, m, e, None)
        origin = gridops.compute_origin(cfg, e)
        passes = raycast.ray_pass_counts(cfg, pw, keep, e, origin, impl="xla")
        hit, minh, mom = fused_point_moments(cfg, pw, keep, origin, interpret=True)
        grid = VoxelGrid(hit_pk=gridops.pack_yz(hit), miss_pk=gridops.pack_yz(passes),
                         minh_pk=gridops.pack_yz(minh), mom=mom, origin=origin)
        ok_a = jnp.any(grid.hit_pk > 0)
        buf_a = pipeline.buffer_insert(cfg, buf_a, grid, ok_a)
        buf_b, ok_b = pipeline._ingest_and_insert_fused(
            cfg, buf_b, p, m, e, None, "xla", interpret=True)
        assert bool(ok_a) == bool(ok_b)
    for name in ("hit_pk", "miss_pk", "minh_pk", "mom", "origin"):
        np.testing.assert_array_equal(
            np.asarray(getattr(buf_a.grids, name)),
            np.asarray(getattr(buf_b.grids, name)), err_msg=name)
    np.testing.assert_array_equal(np.asarray(buf_a.slot_valid), np.asarray(buf_b.slot_valid))
    assert int(buf_a.cursor) == int(buf_b.cursor)
    assert int(buf_a.last_slot) == int(buf_b.last_slot)
