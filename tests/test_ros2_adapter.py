"""Contract test for the import-guarded ROS 2 adapter (`io/ros2.py`).

rclpy is not installed in CI; a fake module tree (rclpy + geometry_msgs +
nav_msgs + visualization_msgs) stands in for the ROS graph, and the test
drives the reference node's full loop: /odom + /plan in, cmd_vel +
/future_states out (`ros2interface.py:24-89` semantics).
"""

import sys
import types

import numpy as np
import pytest

from kissmpc_tpu.io.model import Model


# --- fake ROS message types (attribute trees like the real ones) -----------


class _Vec3:
    def __init__(self):
        self.x = self.y = self.z = 0.0


class _Quat:
    def __init__(self):
        self.x = self.y = self.z = 0.0
        self.w = 1.0


class _Pose:
    def __init__(self):
        self.position = _Vec3()
        self.orientation = _Quat()


class _PoseStamped:
    def __init__(self):
        self.pose = _Pose()


class _Odometry:
    def __init__(self):
        self.pose = types.SimpleNamespace(pose=_Pose())


class _Path:
    def __init__(self):
        self.poses = []


class _Twist:
    def __init__(self):
        self.linear = _Vec3()
        self.angular = _Vec3()


class _Color:
    def __init__(self):
        self.r = self.g = self.b = self.a = 0.0


class _Marker:
    def __init__(self):
        self.ns = ""
        self.id = 0
        self.action = 0
        self.header = types.SimpleNamespace(frame_id="")
        self.pose = _Pose()
        self.scale = _Vec3()
        self.color = _Color()


class _MarkerArray:
    def __init__(self):
        self.markers = []


# --- fake rclpy --------------------------------------------------------------


class _FakeSub:
    def __init__(self, msg_type, topic, callback, depth):
        self.msg_type, self.topic, self.callback, self.depth = (
            msg_type, topic, callback, depth,
        )


class _FakePub:
    def __init__(self, msg_type, topic, depth):
        self.msg_type, self.topic, self.depth = msg_type, topic, depth
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


class _FakeNode:
    def __init__(self, name):
        self.name = name
        self.subs = {}
        self.pubs = {}
        self.timers = []

    def create_subscription(self, msg_type, topic, callback, depth):
        sub = _FakeSub(msg_type, topic, callback, depth)
        self.subs[topic] = sub
        return sub

    def create_publisher(self, msg_type, topic, depth):
        pub = _FakePub(msg_type, topic, depth)
        self.pubs[topic] = pub
        return pub

    def create_timer(self, period, callback):
        self.timers.append((period, callback))
        return (period, callback)


@pytest.fixture
def fake_ros(monkeypatch):
    rclpy = types.SimpleNamespace(
        create_node=lambda name: _FakeNode(name),
        spin=lambda node: None,
    )
    geometry = types.ModuleType("geometry_msgs")
    geometry.msg = types.SimpleNamespace(Twist=_Twist)
    nav = types.ModuleType("nav_msgs")
    nav.msg = types.SimpleNamespace(Odometry=_Odometry, Path=_Path)
    vis = types.ModuleType("visualization_msgs")
    vis.msg = types.SimpleNamespace(Marker=_Marker, MarkerArray=_MarkerArray)
    for name, mod in (
        ("geometry_msgs", geometry),
        ("geometry_msgs.msg", geometry.msg),
        ("nav_msgs", nav),
        ("nav_msgs.msg", nav.msg),
        ("visualization_msgs", vis),
        ("visualization_msgs.msg", vis.msg),
    ):
        monkeypatch.setitem(sys.modules, name, mod)
    return rclpy


def _path_msg(points):
    msg = _Path()
    for x, y in points:
        ps = _PoseStamped()
        ps.pose.position.x = x
        ps.pose.position.y = y
        msg.poses.append(ps)
    return msg


def _odom_msg(x, y, yaw):
    msg = _Odometry()
    msg.pose.pose.position.x = x
    msg.pose.pose.position.y = y
    msg.pose.pose.orientation.z = np.sin(yaw / 2.0)
    msg.pose.pose.orientation.w = np.cos(yaw / 2.0)
    return msg


def test_full_loop_against_fake_rclpy(fake_ros):
    from kissmpc_tpu.io.ros2 import Ros2Interface

    model = Model(
        horizon=6,
        planning_time_step=0.2,
        linear_velocity_bounds=(-0.3, 0.3),
        angular_velocity_bounds=(-0.3, 0.3),
    )
    iface = Ros2Interface(model, rclpy_module=fake_ros, plan_stride=2)
    node = iface.node

    # Topic surface matches the reference node (`ros2interface.py:45-49`).
    assert set(node.subs) == {"/plan", "/odom"}
    assert set(node.pubs) == {"cmd_vel", "/future_states"}
    assert len(node.timers) == 1 and node.timers[0][0] == pytest.approx(0.01)

    # No waypoints yet: tick publishes nothing (`ros2interface.py:52`).
    node.timers[0][1]()
    assert node.pubs["cmd_vel"].published == []

    # Feed odometry + plan through the real callbacks.
    node.subs["/odom"].callback(_odom_msg(0.0, 0.0, 0.0))
    node.subs["/plan"].callback(
        _path_msg([(0.1 * i, 0.02 * i) for i in range(7)])
    )
    # First waypoint is the robot's own pose (a Nav2 plan starts at the
    # robot), so the first tick solves to a zero goal and the waypoint
    # advances; subsequent ticks drive forward.
    for _ in range(3):
        node.timers[0][1]()

    cmds = node.pubs["cmd_vel"].published
    assert len(cmds) == 3
    v, w = cmds[-1].linear.x, cmds[-1].angular.z
    assert 0.0 < v <= 0.3 + 1e-6  # drives forward toward the goal
    assert abs(w) <= 0.3 + 1e-6

    markers = node.pubs["/future_states"].published
    assert len(markers) == 3
    assert len(markers[0].markers) == model.cfg.horizon + 1
    assert markers[0].markers[0].ns == "future_states"

    # A refreshed plan whose final pose barely moved is gated out
    # (`ros2interface.py:121-140`).
    before, _ = iface.plan.read()
    node.subs["/plan"].callback(
        _path_msg([(0.1 * i, 0.02 * i + 0.001) for i in range(7)])
    )
    after, _ = iface.plan.read()
    np.testing.assert_array_equal(before, after)


def test_odometry_resets_warm_start(fake_ros):
    from kissmpc_tpu.io.ros2 import Ros2Interface

    model = Model(horizon=5, planning_time_step=0.2)
    iface = Ros2Interface(model, rclpy_module=fake_ros)
    node = iface.node
    node.subs["/plan"].callback(_path_msg([(0.5, 0.0), (1.0, 0.0)]))
    node.subs["/odom"].callback(_odom_msg(0.2, -0.1, 0.3))
    node.timers[0][1]()
    # The tick folded the odometry pose into the model before solving
    # (`ros2interface.py:91-107`: reset(matrices_only=True) from odom).
    np.testing.assert_allclose(
        model.initial_state, [0.2, -0.1, 0.3], atol=1e-9
    )


def test_module_imports_without_rclpy():
    import kissmpc_tpu.io.ros2 as mod

    assert mod.ros2_available() is False
