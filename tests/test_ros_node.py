"""Execute the ROS layer (gvom_tpu/ros/node.py) end-to-end against stubbed
rospy / tf2_ros / message modules.

The reference node was only ever validated live on robots
(/root/reference/scripts/gvom_ros.py); here a synthetic PointCloud2 is fed
through cb_odom → cb_lidar → cb_timer and every one of the 11 published
topics (7 OccupancyGrid + 4 debug PointCloud2 declared, 3 published —
debug/lidar is declared-but-never-published, gvom_ros.py:74) is checked for
schema, dtype, and Fortran-order flattening (gvom_ros.py:142-165).
"""

import importlib
import sys
import types

import numpy as np
import pytest


# ----------------------------------------------------------------------
# rospy / tf2_ros / message stubs


class _Bag:
    """Attribute bag that auto-creates nested bags on first access."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        child = _Bag()
        self.__dict__[name] = child
        return child


class _Publisher:
    def __init__(self, log, name, msg_type):
        self.log = log
        self.name = name
        self.msg_type = msg_type

    def publish(self, msg):
        self.log.setdefault(self.name, []).append(msg)


def _make_rospy(params, published):
    rospy = types.ModuleType("rospy")
    rospy.get_param = lambda key, default=None: params.get(key, default)
    rospy.Publisher = lambda name, msg_type, queue_size=1: _Publisher(published, name, msg_type)

    subscribers = {}
    timers = []
    rospy.Subscriber = lambda name, msg_type, cb, queue_size=1: subscribers.setdefault(name, cb)
    rospy.Timer = lambda duration, cb: timers.append((duration, cb))
    rospy.Duration = lambda secs: secs

    class _Time:
        @staticmethod
        def now():
            return 0.0

    rospy.Time = _Time
    rospy.init_node = lambda name: None
    rospy.spin = lambda: None
    rospy._subscribers = subscribers
    rospy._timers = timers
    return rospy


def _make_tf2(tf_log):
    tf2 = types.ModuleType("tf2_ros")

    class Buffer:
        def lookup_transform(self, target, source, stamp, timeout=None):
            tf_log.append((target, source, stamp))
            t = _Bag()
            t.transform.translation = _Bag(x=0.0, y=0.0, z=0.0)
            t.transform.rotation = _Bag(x=0.0, y=0.0, z=0.0, w=1.0)
            return t

    tf2.Buffer = Buffer
    tf2.TransformListener = lambda buf: None
    return tf2


def _make_msg_modules():
    nav = types.ModuleType("nav_msgs")
    nav_msg = types.ModuleType("nav_msgs.msg")
    nav_msg.OccupancyGrid = lambda: _Bag()
    nav_msg.Odometry = type("Odometry", (), {})
    nav.msg = nav_msg

    sensor = types.ModuleType("sensor_msgs")
    sensor_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msg.PointCloud2 = lambda: _Bag()

    class RosPointField:
        def __init__(self, name="", offset=0, datatype=7, count=1):
            self.name, self.offset, self.datatype, self.count = name, offset, datatype, count

    sensor_msg.PointField = RosPointField
    sensor.msg = sensor_msg
    return {"nav_msgs": nav, "nav_msgs.msg": nav_msg,
            "sensor_msgs": sensor, "sensor_msgs.msg": sensor_msg}


@pytest.fixture
def ros_env(monkeypatch):
    published = {}
    tf_log = []
    params = {
        "~width": 64, "~height": 32, "~z_resolution": 0.4,
        "~buffer_size": 2, "~max_points": 4096, "~freq": 10.0,
    }
    rospy = _make_rospy(params, published)
    mods = {"rospy": rospy, "tf2_ros": _make_tf2(tf_log)}
    mods.update(_make_msg_modules())
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    # force a re-import bound to the stubs
    monkeypatch.delitem(sys.modules, "gvom_tpu.ros.node", raising=False)
    node_mod = importlib.import_module("gvom_tpu.ros.node")
    node_mod = importlib.reload(node_mod)
    yield types.SimpleNamespace(
        node_mod=node_mod, rospy=rospy, published=published, tf_log=tf_log, params=params
    )
    monkeypatch.delitem(sys.modules, "gvom_tpu.ros.node", raising=False)


def _synthetic_cloud_msg(node_mod, seed=0):
    """Ground plane + a wall, encoded as a PointCloud2 message stub."""
    from gvom_tpu.io.pointcloud2 import array_to_pointcloud2

    rng = np.random.default_rng(seed)
    ground = np.stack(
        [rng.uniform(-8, 8, 1500), rng.uniform(-8, 8, 1500), rng.normal(0.0, 0.01, 1500)],
        axis=1,
    )
    wall = np.stack(
        [np.full(400, 5.0) + rng.normal(0, 0.02, 400),
         rng.uniform(-2, 2, 400), rng.uniform(0.1, 1.8, 400)],
        axis=1,
    )
    pts = np.concatenate([ground, wall]).astype(np.float32)
    wire, spec = array_to_pointcloud2(pts, ["x", "y", "z"])

    msg = _Bag()
    msg.header.frame_id = "lidar"
    msg.header.stamp = 0.0
    msg.fields = [
        types.SimpleNamespace(name=f.name, offset=f.offset, datatype=f.datatype, count=f.count)
        for f in spec.fields
    ]
    msg.point_step = spec.point_step
    msg.width = spec.width
    msg.height = spec.height
    msg.is_bigendian = spec.is_bigendian
    msg.data = wire
    return msg, pts


GRID_TOPICS = (
    "~soft_obstacle_map", "~positive_obstacle_map", "~negative_obstacle_map",
    "~hard_obstacle_map", "~ground_certainty_map", "~all_ground_certainty_map",
    "~roughness_map",
)
DEBUG_TOPICS = ("~debug/voxel", "~debug/height_map", "~debug/inferred_height_map")


def test_ros_node_end_to_end(ros_env):
    node = ros_env.node_mod.GvomRosNode()
    cfg = node.node.config
    assert cfg.xy_size == 64 and cfg.z_size == 32 and cfg.max_points == 4096

    # the full reference topic surface is declared (gvom_ros.py:61-77)
    assert set(node.pubs) == {t[1:] for t in GRID_TOPICS}
    assert set(node.debug_pubs) == {"debug/lidar", "debug/voxel",
                                    "debug/height_map", "debug/inferred_height_map"}
    subs = ros_env.rospy._subscribers
    assert set(subs) == {"~cloud", "~odom"}
    assert len(ros_env.rospy._timers) == 1

    # --- odom then lidar through the recorded subscriber callbacks ---
    odom = _Bag()
    odom.pose.pose.position = _Bag(x=0.5, y=0.25, z=1.6)
    subs["~odom"](odom)

    msg, _ = _synthetic_cloud_msg(ros_env.node_mod)
    subs["~cloud"](msg)
    assert ros_env.tf_log and ros_env.tf_log[0][0] == cfg.odom_frame
    assert ros_env.tf_log[0][1] == "lidar"

    # --- combine tick (the reference's cb_timer, gvom_ros.py:113) ---
    timer_cb = ros_env.rospy._timers[0][1]
    timer_cb(None)

    published = ros_env.published
    for topic in GRID_TOPICS:
        assert topic in published, f"{topic} never published"
        grid = published[topic][-1]
        assert grid.info.width == cfg.xy_size and grid.info.height == cfg.xy_size
        assert grid.info.resolution == cfg.xy_resolution
        assert grid.header.frame_id == cfg.odom_frame
        data = np.asarray(grid.data)
        assert data.dtype == np.int8 and data.shape == (cfg.xy_size * cfg.xy_size,)

    # Fortran-order flatten parity with the engine layer (gvom_ros.py:142)
    layers = node.node.last_layers
    pos_wire = np.asarray(published["~positive_obstacle_map"][-1].data)
    np.testing.assert_array_equal(
        pos_wire, np.reshape(layers["positive_obstacle_map"], -1, order="F").astype(np.int8)
    )
    # the wall must show up as a positive obstacle somewhere
    assert np.asarray(published["~positive_obstacle_map"][-1].data).max() > 0
    # visibility/certainty must be nonzero where ground was observed
    assert np.asarray(published["~ground_certainty_map"][-1].data).max() == 100

    # --- debug clouds (gvom_ros.py:170-189) ---
    for topic in DEBUG_TOPICS:
        assert topic in published, f"{topic} never published"
        cloud = published[topic][-1]
        n_fields = len(cloud.fields)
        assert cloud.point_step == 4 * n_fields
        assert cloud.row_step == cloud.point_step * cloud.width
        assert len(cloud.data) == cloud.row_step
        arr = np.frombuffer(cloud.data, np.float32).reshape(-1, n_fields)
        assert arr.shape[0] == cloud.width and np.isfinite(arr).all()
    assert [f.name for f in published["~debug/voxel"][-1].fields] == [
        "x", "y", "z", "solid factor", "count", "eigen_line", "eigen_surface", "eigen_point"
    ]
    assert [f.name for f in published["~debug/height_map"][-1].fields] == [
        "x", "y", "z", "roughness", "slope_x", "slope_y", "slope", "obstacles"
    ]
    # declared but never published — reference parity (gvom_ros.py:74)
    assert "~debug/lidar" not in published


def test_ros_node_round_trip_cloud_decode(ros_env):
    """The node's PointCloud2 decode path must recover exactly the points the
    wire format carried (identity tf)."""
    node = ros_env.node_mod.GvomRosNode()
    seen = {}
    node.node.on_pointcloud = lambda pts, tf=None: seen.setdefault("pts", pts)
    msg, pts = _synthetic_cloud_msg(ros_env.node_mod, seed=3)
    ros_env.rospy._subscribers["~cloud"](msg)
    np.testing.assert_array_equal(seen["pts"], pts)
