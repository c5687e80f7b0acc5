"""Component tests: host node layer math, scan logs, replay, checkpoint,
PointCloud2 deserialization (Python + native C), config system."""

import dataclasses
import os
import tempfile

import numpy as np
import pytest

from gvom_tpu.config import GvomConfig, load_config
from gvom_tpu.engine.node import VoxelMapperNode
from gvom_tpu.engine.replay import sequential_replay
from gvom_tpu.io import synthetic
from gvom_tpu.io.logio import ScanLog, load_log, save_log, synthesize_log
from gvom_tpu.io.pointcloud2 import CloudSpec, PointField, native_available, pointcloud2_to_xyz
from gvom_tpu.utils.checkpoint import load_world, save_world
from gvom_tpu.utils.metrics import StepMetrics


def test_config_aliases_and_validation():
    cfg = GvomConfig.from_dict({"width": 128, "height": 32, "slope_obsacle_threshold": 0.25, "freq": 5.0})
    assert cfg.xy_size == 128 and cfg.z_size == 32
    assert cfg.slope_obstacle_threshold == 0.25 and cfg.combine_freq == 5.0
    with pytest.raises(ValueError):
        GvomConfig.from_dict({"bogus_key": 1})
    with pytest.raises(ValueError):
        GvomConfig(buffer_size=0).validate()


def test_config_file_roundtrip(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(GvomConfig(xy_size=32, z_size=16).to_json())
    cfg = load_config(str(p), overrides={"buffer_size": 2})
    assert cfg.xy_size == 32 and cfg.buffer_size == 2


def test_node_layer_math(small_cfg):
    node = VoxelMapperNode(config=small_cfg, raycast_impl="xla")
    published = {}
    node.publisher = lambda name, data, meta: published.setdefault(name, data)
    ego = np.array([0.3, -0.2, 1.5])
    node.on_odometry(ego)
    pts = synthetic.simulate_lidar_scan(
        synthetic.composite_terrain(), ego, channels=32, azimuth_steps=64, max_range=25.0
    )
    assert node.on_pointcloud(pts)
    layers = node.publish_maps()
    assert layers is not None
    for name in (
        "hard_obstacle_map", "soft_obstacle_map", "negative_obstacle_map",
        "ground_certainty_map", "roughness_map", "positive_obstacle_map",
    ):
        assert name in published
    pos = layers["positive_obstacle_map"]
    hard = layers["hard_obstacle_map"]
    soft = layers["soft_obstacle_map"]
    neg = layers["negative_obstacle_map"]
    np.testing.assert_array_equal(
        hard, np.maximum(100 * (pos > small_cfg.density_threshold), neg).astype(np.int8)
    )
    np.testing.assert_array_equal(
        soft, (100 * (pos <= small_cfg.density_threshold) * (pos > 0)).astype(np.int8)
    )
    # no odom -> refused
    node2 = VoxelMapperNode(config=small_cfg)
    assert not node2.on_pointcloud(pts)


def test_scan_log_roundtrip(tmp_path):
    log = synthesize_log(3, channels=8, azimuth_steps=16, max_range=10.0)
    p = str(tmp_path / "log.npz")
    save_log(p, log)
    log2 = load_log(p)
    assert len(log2) == 3
    np.testing.assert_allclose(log2[1][0], log[1][0])
    np.testing.assert_allclose(log2[1][1], log[1][1])


def test_sequential_replay(small_cfg):
    log = synthesize_log(3, channels=16, azimuth_steps=32, max_range=15.0)
    engine, outputs, metrics = sequential_replay(small_cfg, log, raycast_impl="xla")
    assert len(outputs) == 3 and outputs[-1] is not None
    snap = metrics.snapshot()
    assert snap["counters"]["scans"] == 3 and snap["counters"]["combines"] == 3


def test_checkpoint_roundtrip(small_cfg, tmp_path):
    from gvom_tpu.types import empty_world_state
    import jax.numpy as jnp

    world = empty_world_state(small_cfg)
    from gvom_tpu.ops.grid import pack_yz

    world = world._replace(
        grid=world.grid._replace(hit_pk=pack_yz(world.grid.hit.at[1, 2, 3].set(7))),
        valid=jnp.asarray(True),
    )
    p = save_world(str(tmp_path / "world"), world, small_cfg)
    w2 = load_world(p)
    assert int(w2.grid.hit[1, 2, 3]) == 7
    assert bool(w2.valid)


def _make_cloud_bytes(xyz, point_step=16, dtype=np.float32):
    n = len(xyz)
    buf = np.zeros((n, point_step), np.uint8)
    itemsize = np.dtype(dtype).itemsize
    for i, off in enumerate((0, itemsize, 2 * itemsize)):
        buf[:, off : off + itemsize] = (
            xyz[:, i].astype(dtype).view(np.uint8).reshape(n, itemsize)
        )
    fields = [
        PointField("x", 0, 7 if dtype == np.float32 else 8),
        PointField("y", itemsize, 7 if dtype == np.float32 else 8),
        PointField("z", 2 * itemsize, 7 if dtype == np.float32 else 8),
    ]
    return buf.tobytes(), CloudSpec(fields=fields, point_step=point_step, width=n)


def test_pointcloud2_python_path():
    xyz = np.array([[1.0, 2.0, 3.0], [np.nan, 0.0, 0.0], [4.0, 5.0, 6.0]], np.float32)
    data, spec = _make_cloud_bytes(xyz)
    out = pointcloud2_to_xyz(data, spec, use_native=False)
    np.testing.assert_allclose(out, xyz[[0, 2]])


def test_pointcloud2_native_path():
    if not native_available():
        pytest.skip("no C toolchain")
    xyz = np.array([[1.0, 2.0, 3.0], [np.nan, 0.0, 0.0], [4.0, 5.0, 6.0]], np.float32)
    data, spec = _make_cloud_bytes(xyz, point_step=20)
    out = pointcloud2_to_xyz(data, spec, use_native=True)
    np.testing.assert_allclose(out, xyz[[0, 2]])
    # f64 fields too
    xyz64 = np.array([[1.5, -2.0, 0.25]], np.float64)
    data, spec = _make_cloud_bytes(xyz64, point_step=32, dtype=np.float64)
    out = pointcloud2_to_xyz(data, spec, use_native=True)
    np.testing.assert_allclose(out, xyz64, atol=1e-6)


def test_metrics():
    m = StepMetrics()
    m.bump("scans", 3)
    m.record("t", 0.5)
    snap = m.snapshot()
    assert snap["counters"]["scans"] == 3
    assert snap["timings"]["t"]["n"] == 1


def test_crash_recovery_resume_determinism(small_cfg, tmp_path):
    """SURVEY.md §5 crash recovery: resuming from a world snapshot and
    replaying the remaining stream gives bit-identical outputs to the
    uninterrupted run (the ring buffer refills from the stream: buffer_size=3
    means scans 4-6 fully repopulate it)."""
    from gvom_tpu.engine.gvom import Gvom
    from gvom_tpu.io import synthetic as synth

    def scans():
        ego = np.array([0.3, -0.2, 1.5])
        for i in range(6):
            ego = ego + np.array([0.6, 0.3, 0.02])
            pts = synth.simulate_lidar_scan(
                synth.composite_terrain(), ego, channels=16, azimuth_steps=48,
                max_range=20.0, seed=i,
            )
            yield synth.nudge_off_grid(pts, small_cfg.xy_resolution, small_cfg.z_resolution), ego

    stream = list(scans())
    a = Gvom(config=small_cfg)
    for pts, ego in stream[:3]:
        a.process_pointcloud(pts, ego)
    assert a.combine_maps() is not None
    ckpt = a.save_checkpoint(str(tmp_path / "mid"))
    for pts, ego in stream[3:]:
        a.process_pointcloud(pts, ego)
    out_a = a.combine_maps()

    b = Gvom(config=small_cfg)
    b.load_checkpoint(ckpt)
    for pts, ego in stream[3:]:
        b.process_pointcloud(pts, ego)
    out_b = b.combine_maps()

    np.testing.assert_array_equal(out_a[0], out_b[0])
    for x, y in zip(out_a[1:], out_b[1:]):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(
        a.get_map_as_occupancy_grid(), b.get_map_as_occupancy_grid()
    )

    bad = Gvom(config=dataclasses.replace(small_cfg, z_size=small_cfg.z_size * 2))
    with pytest.raises(ValueError):
        bad.load_checkpoint(ckpt)


def test_pointcloud2_encoder_roundtrip():
    from gvom_tpu.io.pointcloud2 import array_to_pointcloud2

    a = np.random.default_rng(0).normal(size=(64, 8)).astype(np.float32)
    names = ["x", "y", "z", "solid factor", "count", "eigen_line", "eigen_surface", "eigen_point"]
    wire, spec = array_to_pointcloud2(a, names)
    assert [f.name for f in spec.fields] == names
    xyz = pointcloud2_to_xyz(wire, spec)
    np.testing.assert_array_equal(xyz, a[:, :3])
    with pytest.raises(ValueError):
        array_to_pointcloud2(a, names[:3])


def test_node_debug_publish_channels(small_cfg):
    """publish_debug emits the reference's debug clouds with its channel
    names, incl. the obstacles channel appended to the height-map cloud
    (gvom_ros.py:170-189)."""
    got = {}
    node = VoxelMapperNode(config=small_cfg, publisher=lambda n, d, m: got.setdefault(n, (d, m)))
    node.on_odometry(np.array([0.3, -0.2, 1.5]))
    ego = np.array([0.3, -0.2, 1.5])
    for i in range(2):
        ego = ego + np.array([0.5, 0.2, 0.0])
        node.on_odometry(ego)
        pts = synthetic.simulate_lidar_scan(
            synthetic.composite_terrain(), ego, channels=16, azimuth_steps=48, max_range=20.0, seed=i
        )
        node.on_pointcloud(pts)
    assert node.publish_maps() is not None
    node.publish_debug()
    X = small_cfg.xy_size
    d, m = got["debug/height_map"]
    assert d.shape == (X * X, 8) and m["channels"][-1] == "obstacles"
    # the appended channel is the Fortran-flattened positive obstacle map
    np.testing.assert_array_equal(
        d[:, 7], np.reshape(got["positive_obstacle_map"][0], -1, order="F").astype(np.float32)
    )
    d, m = got["debug/voxel"]
    assert d.shape[1] == 8 and m["channels"][3] == "solid factor"
    d, m = got["debug/inferred_height_map"]
    assert d.shape == (X * X, 3) and m["channels"] == ["x", "y", "z"]


def test_point_overflow_accounting(small_cfg, capsys):
    """A scan beyond max_points is truncated LOUDLY (counter + warning) and
    the kept prefix maps identically to feeding that prefix directly
    (VERDICT round 1: silent truncation at engine/gvom.py:94-104)."""
    from gvom_tpu.engine.gvom import Gvom

    cfg = small_cfg
    ego = np.array([0.3, -0.2, 1.5])
    rng = np.random.default_rng(3)
    big = (ego[None, :] + rng.normal(0, 3, (2 * cfg.max_points, 3))).astype(np.float32)

    eng_full = Gvom(config=cfg, raycast_impl="xla")
    eng_full.process_pointcloud(big, ego)
    out_msg = capsys.readouterr().out
    assert "dropping" in out_msg and str(cfg.max_points) in out_msg
    snap = eng_full.metrics.snapshot()["counters"]
    assert snap["points_truncated"] == cfg.max_points
    assert snap["scans_truncated"] == 1
    full = eng_full.combine_maps()

    eng_prefix = Gvom(config=cfg, raycast_impl="xla")
    eng_prefix.process_pointcloud(big[: cfg.max_points], ego)
    assert "scans_truncated" not in eng_prefix.metrics.snapshot()["counters"]
    prefix = eng_prefix.combine_maps()

    for a, b in zip(full[1:], prefix[1:]):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_legacy_orbax_layout(small_cfg, tmp_path):
    """Snapshots written before `evidence` moved from VoxelGrid to WorldState
    carry it inside the grid dict and lack the top-level key; load_world must
    restore them rather than TypeError (ADVICE r3; a failed orbax restore
    silently falls back to a much older snapshot in load_resumable)."""
    pytest.importorskip("orbax.checkpoint")
    import orbax.checkpoint as ocp

    import jax.numpy as jnp

    from gvom_tpu.types import empty_world_state

    world = empty_world_state(small_cfg)
    from gvom_tpu.ops.grid import pack_yz

    grid = world.grid._replace(hit_pk=pack_yz(world.grid.hit.at[4, 5, 6].set(3)))
    legacy_ev = jnp.zeros(small_cfg.grid_shape, jnp.int32).at[1, 1, 1].set(9)
    # pre-move checkpoints stored the LOGICAL [X, Y, Z] channel arrays with
    # evidence inside the grid dict
    legacy = {"hit": grid.hit, "miss": grid.miss, "min_height": grid.min_height,
              "mom": grid.mom, "origin": grid.origin}
    legacy["evidence"] = legacy_ev               # pre-move layout
    path = str(tmp_path / "legacy_ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"grid": legacy, "valid": jnp.asarray(True)}, force=True)
    ckptr.wait_until_finished()

    w = load_world(path)
    assert int(w.grid.hit[4, 5, 6]) == 3
    assert int(w.evidence[1, 1, 1]) == 9         # recovered from the grid dict
    assert bool(w.valid)
