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
    ev = canonical(w2.grid.evidence, origin)
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
        np.asarray(full_world.grid.evidence), np.asarray(resumed_world.grid.evidence)
    )
