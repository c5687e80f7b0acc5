"""rosbag v1 reader / ScanLog converter round-trip (no ROS installation).

The reference workflow replayed recorded bags through the node
(/root/reference/install.md, gvom_ros.py:82-109); gvom_tpu.io.rosbag reads
those bags directly. These tests write minimal-but-valid v2.0 bags (flat,
chunked, bz2-chunked) and check cloud/odom pairing semantics."""

import subprocess
import sys

import numpy as np
import pytest

from gvom_tpu.io import rosbag
from gvom_tpu.io.logio import load_log


def _make_messages(n_scans=3, seed=0):
    rng = np.random.default_rng(seed)
    msgs = []
    clouds = []
    for i in range(n_scans):
        t = 100.0 + i
        pos = np.array([0.5 * i, 0.25 * i, 1.6])
        msgs.append(("/odom", "nav_msgs/Odometry", t - 0.05,
                     rosbag.serialize_odometry(pos, t - 0.05)))
        xyz = rng.uniform(-5, 5, (50 + 10 * i, 3)).astype(np.float32)
        clouds.append((xyz, pos))
        msgs.append(("/lidar/points", "sensor_msgs/PointCloud2", t,
                     rosbag.serialize_pointcloud2(xyz, t)))
    return msgs, clouds


@pytest.mark.parametrize("chunked", [None, "none", "bz2", "lz4"])
def test_bag_round_trip(tmp_path, chunked):
    msgs, clouds = _make_messages()
    path = str(tmp_path / "drive.bag")
    rosbag.write_minimal_bag(path, msgs, chunked=chunked)

    log = rosbag.bag_to_scanlog(path)
    assert len(log) == len(clouds)
    for (pts, ego, tf), (xyz, pos) in zip(log, clouds):
        np.testing.assert_array_equal(pts, xyz)
        np.testing.assert_allclose(ego, pos)
        assert tf is None


def test_cloud_before_any_odom_dropped(tmp_path):
    msgs, clouds = _make_messages(n_scans=2)
    # a cloud at t=50, before the first odom at ~99.95 → dropped (the
    # reference's "no odom" guard, gvom_ros.py:85-87)
    early = rosbag.serialize_pointcloud2(np.zeros((5, 3), np.float32), 50.0)
    msgs.insert(0, ("/lidar/points", "sensor_msgs/PointCloud2", 50.0, early))
    path = str(tmp_path / "early.bag")
    rosbag.write_minimal_bag(path, msgs)
    log = rosbag.bag_to_scanlog(path)
    assert len(log) == len(clouds)


def test_latest_odom_at_or_before_pairing(tmp_path):
    # two odoms straddle the cloud; the earlier one must win
    msgs = [
        ("/odom", "nav_msgs/Odometry", 10.0, rosbag.serialize_odometry([1.0, 0, 0], 10.0)),
        ("/odom", "nav_msgs/Odometry", 12.0, rosbag.serialize_odometry([2.0, 0, 0], 12.0)),
        ("/lidar/points", "sensor_msgs/PointCloud2", 11.0,
         rosbag.serialize_pointcloud2(np.ones((4, 3), np.float32), 11.0)),
    ]
    path = str(tmp_path / "pair.bag")
    rosbag.write_minimal_bag(path, msgs)
    log = rosbag.bag_to_scanlog(path)
    assert len(log) == 1
    np.testing.assert_allclose(log[0][1], [1.0, 0.0, 0.0])


def test_ambiguous_topics_need_explicit_choice(tmp_path):
    msgs, _ = _make_messages(n_scans=1)
    extra = rosbag.serialize_pointcloud2(np.zeros((3, 3), np.float32), 101.0)
    msgs.append(("/other/points", "sensor_msgs/PointCloud2", 101.0, extra))
    path = str(tmp_path / "two.bag")
    rosbag.write_minimal_bag(path, msgs)
    with pytest.raises(ValueError, match="cloud"):
        rosbag.bag_to_scanlog(path)
    log = rosbag.bag_to_scanlog(path, cloud_topic="/lidar/points")
    assert len(log) == 1


def test_non_bag_rejected(tmp_path):
    path = tmp_path / "not.bag"
    path.write_bytes(b"definitely not a bag")
    with pytest.raises(ValueError, match="not a rosbag"):
        rosbag.read_bag_messages(str(path))


def test_convert_bag_cli(tmp_path):
    msgs, clouds = _make_messages()
    bag = str(tmp_path / "drive.bag")
    out = str(tmp_path / "drive.npz")
    rosbag.write_minimal_bag(bag, msgs, chunked="bz2")
    r = subprocess.run(
        [sys.executable, "-m", "gvom_tpu.cli", "convert-bag", bag, out],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": ".", "HOME": "/root"},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    log = load_log(out)
    assert len(log) == len(clouds)
    np.testing.assert_array_equal(log[0][0], clouds[0][0])
