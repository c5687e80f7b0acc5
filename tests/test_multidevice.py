"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded batched step vs a single-device reference computation, batched
replay driver, and the driver entry points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gvom_tpu.io import synthetic
from gvom_tpu.io.logio import synthesize_log
from gvom_tpu.models import pipeline
from gvom_tpu.parallel.mesh import factor_devices, make_mesh
from gvom_tpu.parallel.sharding import make_batched_step
from gvom_tpu.types import empty_world_state


@pytest.fixture(scope="module")
def tiny_cfg():
    from gvom_tpu.config import GvomConfig

    return GvomConfig(xy_size=32, z_size=16, max_points=1024, buffer_size=2)


def _scan_batch(cfg, n):
    scans, masks, egos = [], [], []
    ego = np.array([0.3, -0.2, 1.5])
    for i in range(n):
        ego = ego + np.array([0.15, 0.1, 0.0])
        pts = synthetic.simulate_lidar_scan(
            synthetic.composite_terrain(), ego, channels=8, azimuth_steps=32, max_range=10.0, seed=i
        )
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        scans.append(pad)
        masks.append(mask)
        egos.append(ego.astype(np.float32))
    return jnp.asarray(np.stack(scans)), jnp.asarray(np.stack(masks)), jnp.asarray(np.stack(egos))


def test_factor_devices():
    assert factor_devices(8) == (4, 2)
    assert factor_devices(8, space=4) == (2, 4)
    with pytest.raises(ValueError):
        factor_devices(8, space=3)


def test_batched_step_matches_mesh_sizes(tiny_cfg):
    """The same batch produces identical products on 8-device and 1-device
    meshes (the collectives are associative reductions)."""
    scans, masks, egos = _scan_batch(tiny_cfg, 8)
    out = {}
    for ndev in (1, 8):
        mesh = make_mesh(jax.devices()[:ndev])
        step = make_batched_step(tiny_cfg, mesh, raycast_impl="xla")
        world = empty_world_state(tiny_cfg)
        w2, products = step(world, scans, masks, egos)
        out[ndev] = (np.asarray(products.visibility), np.asarray(products.positive_obstacle),
                     np.asarray(products.height), np.asarray(w2.grid.hit))
    np.testing.assert_array_equal(out[1][0], out[8][0])
    np.testing.assert_allclose(out[1][2], out[8][2], atol=1e-5)
    np.testing.assert_array_equal(out[1][3], out[8][3])
    # positive obstacles: exclude singular plane fits (different mesh sizes
    # fuse float ops differently; det==0 cells flip arbitrarily)
    from helpers import singular_fit_mask
    ok = ~singular_fit_mask(out[1][2].astype(np.float64), tiny_cfg.xy_resolution)
    np.testing.assert_array_equal(out[1][1][ok], out[8][1][ok])
    assert out[8][0].sum() > 0


def test_batched_step_world_persistence(tiny_cfg):
    """Second step revives/decays against the first step's world."""
    mesh = make_mesh(jax.devices()[:8])
    step = make_batched_step(tiny_cfg, mesh, raycast_impl="xla")
    world = empty_world_state(tiny_cfg)
    scans, masks, egos = _scan_batch(tiny_cfg, 8)
    world, p1 = step(world, scans, masks, egos)
    assert bool(world.valid)
    world2, p2 = step(world, scans, masks, egos)
    # re-observing the same scene: world hit counts grow
    assert int(np.asarray(world2.grid.hit).sum()) >= int(np.asarray(world.grid.hit).sum())


def test_batched_replay_driver(tiny_cfg):
    from gvom_tpu.engine.replay import batched_replay

    log = synthesize_log(8, channels=8, azimuth_steps=32, max_range=10.0)
    world, products, metrics = batched_replay(tiny_cfg, log, batch_size=8, raycast_impl="xla")
    assert bool(world.valid)
    assert metrics.snapshot()["counters"]["scans"] == 8
    assert len(products) == 1


def test_batched_replay_partial_final_batch(tiny_cfg):
    """A final partial batch must pad to a full MESH multiple (the scan axis
    shards over both axes); the scans metric counts only real scans."""
    from gvom_tpu.engine.replay import batched_replay

    log = synthesize_log(10, channels=8, azimuth_steps=32, max_range=10.0)
    world, products, metrics = batched_replay(tiny_cfg, log, batch_size=8, raycast_impl="xla")
    assert bool(world.valid)
    assert metrics.snapshot()["counters"]["scans"] == 10
    assert len(products) == 2


def test_batched_step_full_ray_budget(tiny_cfg):
    """Scans rasterized at a foreign origin (the batch frame) keep their full
    ray length: the centered-ego DDA budget must not truncate them."""
    import dataclasses

    from gvom_tpu.ops import grid as gridops

    # ego far in -x of the frame centered on ego_far: rays toward +x traverse
    # ~xy_size voxels, beyond the centered budget (xy/2 + 4)
    ego_near = np.array([0.3, -0.2, 1.5], np.float32)
    ego_far = ego_near + np.array([tiny_cfg.xy_size * tiny_cfg.xy_resolution * 0.45, 0.0, 0.0], np.float32)
    pts = synthetic.simulate_lidar_scan(
        synthetic.composite_terrain(), ego_near, channels=8, azimuth_steps=32, max_range=14.0, seed=3
    )
    pad, mask = synthetic.pad_scan(pts, tiny_cfg.max_points)

    origin = gridops.compute_origin(tiny_cfg, jnp.asarray(ego_far))
    full_cfg = dataclasses.replace(
        tiny_cfg, ray_steps_override=max(tiny_cfg.xy_size, tiny_cfg.z_size) + 4
    )
    outs = {}
    for name, c in (("centered", tiny_cfg), ("full", full_cfg)):
        g, ok = pipeline.ingest_scan(
            c, jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(ego_near), None, "xla", origin=origin
        )
        outs[name] = int(np.asarray(g.miss).sum())
    assert outs["full"] > outs["centered"], "scene must exercise the truncation"

    mesh = make_mesh(jax.devices()[:8])
    step = make_batched_step(tiny_cfg, mesh, raycast_impl="xla")
    world = empty_world_state(tiny_cfg)
    S = 8
    scans = jnp.asarray(np.stack([pad] * S))
    masks = jnp.asarray(np.stack([mask] * S))
    egos = jnp.asarray(np.stack([ego_near] * (S - 1) + [ego_far]))
    w2, _ = step(world, scans, masks, egos)
    # S-1 untruncated copies of the near scan + whatever the far scan adds
    assert int(np.asarray(w2.grid.miss).sum()) >= (S - 1) * outs["full"]


def test_batched_step_oracle_parity(tiny_cfg):
    """The sharded batched step's world equals the oracle's per-scan maps
    summed (stationary ego ⇒ one shared origin; ingest sums are exact, and
    occupied-wins evidence matches the slot-ordered form when every scan
    shares the frame)."""
    from gvom_tpu.oracle import NumpyOracle
    from helpers import canonical

    ego = np.array([0.3, -0.2, 1.5])
    S = 8
    scan_list = []
    for i in range(S):
        pts = synthetic.simulate_lidar_scan(
            synthetic.composite_terrain(), ego, channels=8, azimuth_steps=32, max_range=10.0, seed=10 + i
        )
        scan_list.append(synthetic.nudge_off_grid(pts, tiny_cfg.xy_resolution, tiny_cfg.z_resolution))

    oracle = NumpyOracle(tiny_cfg)
    sms = [oracle.process_pointcloud(p, ego) for p in scan_list]
    assert all(sm is not None for sm in sms)
    origin = sms[0].origin
    for sm in sms:
        np.testing.assert_array_equal(sm.origin, origin)
    hit_sum = sum(sm.hit for sm in sms)
    pass_sum = sum(sm.passes for sm in sms)
    minh = np.minimum.reduce([np.where(sm.hit > 0, sm.min_height, 1.0) for sm in sms])
    n_sum = sum(sm.n for sm in sms)

    mesh = make_mesh(jax.devices()[:8])
    step = make_batched_step(tiny_cfg, mesh, raycast_impl="xla")
    padded = [synthetic.pad_scan(p, tiny_cfg.max_points) for p in scan_list]
    w2, _ = step(
        empty_world_state(tiny_cfg),
        jnp.asarray(np.stack([p for p, _ in padded])),
        jnp.asarray(np.stack([m for _, m in padded])),
        jnp.asarray(np.stack([ego.astype(np.float32)] * S)),
    )
    np.testing.assert_array_equal(np.asarray(w2.grid.origin), origin)
    np.testing.assert_array_equal(canonical(w2.grid.hit, origin), hit_sum)
    np.testing.assert_array_equal(canonical(w2.grid.miss, origin), pass_sum)
    occ = hit_sum > 0
    np.testing.assert_allclose(canonical(w2.grid.min_height, origin)[occ], minh[occ], atol=1e-5)
    from gvom_tpu.ops import moments
    n_eng, _, _ = moments.unpack_moments(w2.grid.mom, tiny_cfg.z_size)
    np.testing.assert_allclose(canonical(n_eng, origin)[occ], n_sum[occ], rtol=1e-6)
    # negative evidence: occupied-wins zeros; elsewhere the summed passes
    ev = canonical(w2.evidence, origin)
    assert (ev[occ] == 0).all()
    np.testing.assert_array_equal(ev[~occ], pass_sum[~occ])


def test_graft_entry_points():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == out[1].shape
    __graft_entry__.dryrun_multichip(8)


def test_batched_replay_checkpoint_resume(tiny_cfg, tmp_path):
    """batched_replay snapshots every k batches and resumes bit-identically:
    replaying the second half from the mid-log snapshot reproduces the
    uninterrupted final world."""
    from gvom_tpu.engine.replay import batched_replay

    log = synthesize_log(16, channels=8, azimuth_steps=32, max_range=10.0)
    full_world, _, m = batched_replay(
        tiny_cfg, log, batch_size=8,
        checkpoint_dir=str(tmp_path), checkpoint_every=1, raycast_impl="xla",
    )
    assert m.snapshot()["counters"]["checkpoints"] == 2
    resumed_world, _, _ = batched_replay(
        tiny_cfg, list(log)[8:], batch_size=8,
        resume_from=str(tmp_path / "world_b1") if (tmp_path / "world_b1").exists()
        else str(tmp_path / "world_b1.npz"),
        raycast_impl="xla",
    )
    np.testing.assert_array_equal(
        np.asarray(full_world.grid.hit), np.asarray(resumed_world.grid.hit)
    )
    np.testing.assert_array_equal(
        np.asarray(full_world.evidence), np.asarray(resumed_world.evidence)
    )


def test_slab_ops_match_full_grid(tiny_cfg):
    """slab_point_moments / slab raycast sliced columns == the full-grid XLA
    path's, for every slab of a 4-way y split."""
    from gvom_tpu.ops import binning, moments, raycast
    from gvom_tpu.ops import grid as gridops

    cfg = tiny_cfg
    ego = np.array([0.3, -0.2, 1.5], np.float32)
    pts = synthetic.simulate_lidar_scan(
        synthetic.composite_terrain(), ego, channels=8, azimuth_steps=48, max_range=10.0, seed=5
    )
    pad, mask = synthetic.pad_scan(pts, cfg.max_points)
    p, keep = binning.prepare_points(cfg, jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(ego), None)
    origin = gridops.compute_origin(cfg, jnp.asarray(ego))

    passes = raycast.ray_pass_counts_xla(cfg, p, keep, jnp.asarray(ego), origin)
    bins = binning.bin_points(cfg, p, keep, origin)
    n, s1, s2 = moments.box_aggregate_moments(cfg, bins)
    mom_full = moments.pack_moments(
        gridops.window_to_torus(n, origin),
        gridops.window_to_torus(s1, origin),
        gridops.window_to_torus(s2, origin),
    )
    # r5: stored moments are occupancy-pre-masked at ingest; the slab path
    # applies the same mask, so mask the full-grid reference identically
    mom_full = jnp.where(
        moments.packed_voxel_mask(bins.hit > 0, cfg.z_size)[:, None], mom_full, 0.0)
    assert int(np.asarray(passes).sum()) > 0

    Ys = cfg.xy_size // 4
    for k in range(4):
        ys0 = jnp.int32(k * Ys)
        sl = slice(k * Ys, (k + 1) * Ys)
        p_slab = raycast.ray_pass_counts_xla(cfg, p, keep, jnp.asarray(ego), origin, y_window=(ys0, Ys))
        np.testing.assert_array_equal(np.asarray(p_slab), np.asarray(passes)[:, sl, :])
        hit, mh, mom = binning.slab_point_moments(cfg, p, keep, origin, ys0, Ys)
        np.testing.assert_array_equal(np.asarray(hit), np.asarray(bins.hit)[:, sl, :])
        np.testing.assert_array_equal(np.asarray(mh), np.asarray(bins.min_height)[:, sl, :])
        np.testing.assert_allclose(np.asarray(mom), np.asarray(mom_full)[:, :, sl, :], rtol=1e-6, atol=1e-6)


def test_ingest_strategies_agree(tiny_cfg):
    """'slab' and 'scatter' batched steps produce identical worlds/products
    on the same mesh (same xla kernels, different collective layouts)."""
    mesh = make_mesh(jax.devices()[:8])
    scans, masks, egos = _scan_batch(tiny_cfg, 8)
    outs = {}
    for strat in ("slab", "scatter"):
        step = make_batched_step(tiny_cfg, mesh, raycast_impl="xla", ingest=strat)
        w, prods = step(empty_world_state(tiny_cfg), scans, masks, egos)
        outs[strat] = (w, prods)
    wa, pa = outs["slab"]
    wb, pb = outs["scatter"]
    np.testing.assert_array_equal(np.asarray(wa.grid.hit), np.asarray(wb.grid.hit))
    np.testing.assert_array_equal(np.asarray(wa.grid.miss), np.asarray(wb.grid.miss))
    np.testing.assert_array_equal(np.asarray(wa.evidence), np.asarray(wb.evidence))
    # the two strategies are different XLA programs: identical math, but
    # fusion (FMA) differences leave ~1-ulp f32 noise in the float channels
    np.testing.assert_allclose(np.asarray(wa.grid.min_height), np.asarray(wb.grid.min_height), atol=1e-6)
    np.testing.assert_allclose(np.asarray(wa.grid.mom), np.asarray(wb.grid.mom), rtol=1e-5, atol=1e-5)
    # slope-derived layers may flip at (near-)singular 3×3 plane fits — the
    # two strategies sum moments in different orders (f32). Exclude those
    # cells (same rule the parity CLI uses); everything else must agree.
    from gvom_tpu.utils.parity import singular_fit_mask

    ok = ~singular_fit_mask(np.asarray(pa.height), tiny_cfg.xy_resolution)
    for name in ("height", "inferred_height", "guessed_height_delta",
                 "negative_obstacle", "visibility"):
        np.testing.assert_allclose(
            np.asarray(getattr(pa, name)), np.asarray(getattr(pb, name)),
            rtol=1e-5, atol=1e-5, err_msg=name)
    for name in ("slope_x", "slope_y", "roughness", "positive_obstacle"):
        a = np.asarray(getattr(pa, name))[ok]
        b = np.asarray(getattr(pb, name))[ok]
        if name == "roughness":
            # log(MSE) on planar terrain is log of f32 cancellation noise;
            # the published layer clamps at min_roughness (gvom_ros.py:163)
            a = np.maximum(a, tiny_cfg.min_roughness)
            b = np.maximum(b, tiny_cfg.min_roughness)
        mismatch = np.abs(a - b) > 1e-4 + 1e-4 * np.abs(b)
        # the det-threshold mask is itself float-sensitive: a few cells sit
        # right at the guard and flip — tolerate isolated flips, not drift
        assert mismatch.mean() <= 0.01, (name, mismatch.sum(), a[mismatch], b[mismatch])


def test_sharded_world_checkpoint_resume(tiny_cfg, tmp_path):
    """Save a mesh-sharded world mid-replay, restore, continue — bitwise the
    same world and products as the uninterrupted run (crash recovery for the
    sharded batched pipeline; SURVEY.md §5 checkpoint plan)."""
    from gvom_tpu.utils.checkpoint import load_world, save_world

    mesh = make_mesh(jax.devices()[:8])
    step = make_batched_step(tiny_cfg, mesh, raycast_impl="xla")
    scans, masks, egos = _scan_batch(tiny_cfg, 8)
    s2, m2, e2 = _scan_batch(tiny_cfg, 8)

    w = empty_world_state(tiny_cfg)
    w1, _ = step(w, scans, masks, egos)
    # the world leaves step() sharded over the mesh (y-slabs)
    shardings = {str(leaf.sharding) for leaf in jax.tree_util.tree_leaves(w1.grid)
                 if hasattr(leaf, "sharding") and leaf.ndim >= 3}
    assert any("space" in s for s in shardings), shardings

    path = save_world(str(tmp_path / "world_mid"), w1, tiny_cfg)
    wr = load_world(path)
    for a, b in zip(jax.tree_util.tree_leaves(w1), jax.tree_util.tree_leaves(wr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    wa, pa = step(w1, s2, m2, e2)        # uninterrupted
    wb, pb = step(wr, s2, m2, e2)        # resumed from the checkpoint
    for a, b in zip(jax.tree_util.tree_leaves(wa), jax.tree_util.tree_leaves(wb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
