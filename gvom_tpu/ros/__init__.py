"""ROS1 integration (optional; requires rospy).

Parameter-compatible with the reference node (gvom_ros.py:23-41): same
rosparam names (including `slope_obsacle_threshold`), same topic set
(gvom_ros.py:61-77). Import only inside a ROS environment.
"""

try:
    import rospy  # noqa: F401

    from gvom_tpu.ros.node import GvomRosNode, main

    __all__ = ["GvomRosNode", "main"]
    ROS_AVAILABLE = True
except ImportError:  # pragma: no cover - no ROS in CI
    ROS_AVAILABLE = False
    __all__ = []
