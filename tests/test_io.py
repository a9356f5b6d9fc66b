"""Host I/O layer: Model surface, transforms, pub-sub control loop.

Validates the exact surface the reference ROS node consumes
(`ros2interface.py` — against the missing `mpc.model.Model`, SURVEY.md 2.4
item 9) and the race-free snapshot plumbing replacing its callback mutation.
"""

import numpy as np
import pytest

from kissmpc_tpu.io import (
    SE2,
    ControlLoop,
    LatestValue,
    Model,
    decimate_plan,
    plan_changed,
    quaternion_from_yaw,
    yaw_from_quaternion,
)


def test_yaw_quaternion_roundtrip():
    for yaw in [-3.0, -1.2, 0.0, 0.7, 2.9]:
        q = quaternion_from_yaw(yaw)
        np.testing.assert_allclose(yaw_from_quaternion(q), yaw, atol=1e-12)


def test_yaw_matches_scipy():
    scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        expected = scipy_rot.from_quat(q).as_euler("xyz")[2]
        np.testing.assert_allclose(yaw_from_quaternion(q), expected, atol=1e-10)


def test_se2_apply_and_inverse():
    t = SE2(1.0, -2.0, 0.7)
    p = np.array([[0.3, 0.4], [-1.0, 2.0]])
    q = t.apply(p)
    back = t.inverse().apply(q)
    np.testing.assert_allclose(back, p, atol=1e-12)
    pose = np.array([0.3, 0.4, 0.5])
    np.testing.assert_allclose(
        t.apply_pose(pose)[:2], t.apply(pose[:2]), atol=1e-12
    )
    np.testing.assert_allclose(t.apply_pose(pose)[2], 0.5 + 0.7)


def test_decimate_plan_stride_and_final():
    poses = np.stack([np.arange(100.0), np.zeros(100), np.zeros(100)], axis=1)
    wp = decimate_plan(poses, stride=25)
    np.testing.assert_allclose(wp[:, 0], [0.0, 25.0, 50.0, 75.0, 99.0])


def test_plan_changed_gate():
    wps = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 0.0]])
    assert not plan_changed(wps, [1.0, 1.05, 0.0])  # sum diff 0.05 < 0.1
    assert plan_changed(wps, [1.5, 1.0, 0.0])
    assert plan_changed(None, [0.0, 0.0, 0.0])
    assert plan_changed(np.zeros((0, 3)), [0.0, 0.0, 0.0])


def test_model_deployment_surface():
    # Deployment config of the reference node (`ros2interface.py:28-38`).
    model = Model(
        id=1,
        initial_position=(0.0, 0.0),
        initial_orientation=np.deg2rad(90),
        horizon=7,
        use_warm_start=True,
        planning_time_step=0.8,
        linear_velocity_bounds=(-0.3, 0.3),
        angular_velocity_bounds=(-0.3, 0.3),
        waypoints=[],
    )
    assert model.states_matrix.shape == (3, 8)  # reference layout [3, N+1]
    model.waypoints = np.array([[0.0, 2.0, np.pi / 2]])
    model.waypoint_index = 0
    model.update_goal(model.current_waypoint())

    for _ in range(3):
        model.step()
    assert isinstance(model.linear_velocity, float)
    assert abs(model.linear_velocity) <= 0.3 + 1e-5
    assert abs(model.angular_velocity) <= 0.3 + 1e-5
    # heading +y with theta=90deg: should drive forward
    assert model.linear_velocity > 0.05

    # odometry override path (`ros2interface.py:91-107`)
    model.initial_state = np.array([0.0, 0.5, np.pi / 2])
    model.reset(matrices_only=True)
    np.testing.assert_allclose(model.states_matrix[:, 0], [0.0, 0.5, np.pi / 2])
    model.step(state_override=True)
    assert model.linear_velocity > 0.0


def test_model_waypoint_advance():
    model = Model(
        initial_position=(0.0, 0.0),
        initial_orientation=0.0,
        horizon=10,
        planning_time_step=0.2,
        linear_velocity_bounds=(-0.2, 0.5),
        angular_velocity_bounds=(-0.5, 0.5),
        waypoints=[[0.6, 0.0, 0.0], [1.4, 0.0, 0.0]],
    )
    for _ in range(25):
        model.step()
    assert model.waypoint_index == 1
    np.testing.assert_allclose(model.goal_state, [1.4, 0.0, 0.0])


def test_latest_value_versions():
    slot = LatestValue()
    assert slot.read() == (None, 0)
    slot.publish("a")
    slot.publish("b")
    v, ver = slot.read()
    assert v == "b" and ver == 2


def test_control_loop_end_to_end():
    model = Model(
        initial_position=(0.0, 0.0),
        initial_orientation=0.0,
        horizon=8,
        planning_time_step=0.2,
        linear_velocity_bounds=(-0.2, 0.5),
        angular_velocity_bounds=(-0.5, 0.5),
    )
    odom = LatestValue()
    plan = LatestValue()
    commands = []
    loop = ControlLoop(
        model,
        odometry=odom,
        plan=plan,
        on_command=lambda v, w: commands.append((v, w)),
    )
    # no plan yet -> no command (`ros2interface.py:52`)
    assert not loop.tick()
    assert commands == []

    plan.publish(np.array([[1.0, 0.2, 0.0]]))
    odom.publish(np.array([0.0, 0.0, 0.0]))
    for _ in range(5):
        assert loop.tick()
    assert len(commands) == 5
    assert commands[-1][0] > 0.0  # driving toward the goal
    # odometry folded in: plan starts from the published pose
    np.testing.assert_allclose(model.states_matrix[:, 0], [0.0, 0.0, 0.0], atol=0.2)


def test_scenario_record_replay_deterministic(tmp_path):
    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig, default_problem, make_solver
    from kissmpc_tpu.io.replay import ScenarioRecorder, ScenarioReplayer

    cfg = MPCConfig(horizon=8, time_step=0.1)
    solver = make_solver(cfg)
    rec = ScenarioRecorder()
    for i in range(4):
        p = default_problem(
            cfg, jnp.array([0.0, 0.0, 0.0]),
            jnp.array([1.0, 0.1 * i, 0.0]), dtype=jnp.float64,
        )
        rec.record(p, solver(p))
    path = str(tmp_path / "session.npz")
    rec.save(path)

    rep = ScenarioReplayer(path)
    assert rep.num_ticks == 4
    # bit-exact determinism on the same backend
    assert rep.verify(solver, atol=0.0) == 0.0
    # tampering is detected
    rep._solutions = rep._solutions._replace(
        controls=rep._solutions.controls + 1e-3
    )
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        rep.verify(solver, atol=1e-6)


def test_future_states_markers_both_layouts():
    from kissmpc_tpu.io.markers import future_states_markers

    states = np.array(
        [[0.0, 0.0, 0.0], [0.5, 0.1, 0.2], [1.0, 0.2, 0.4], [1.5, 0.3, 0.6]]
    )
    for layout in (states, states.T):  # [N+1,3] and reference [3,N+1]
        ms = future_states_markers(layout)
        assert len(ms) == 4
        assert ms[1]["position"][:2] == (0.5, 0.1)
        assert ms[0]["type"] == "sphere"


def test_track_markers_delete_on_vanish():
    from kissmpc_tpu.io.markers import ADD, DELETE, TrackMarkerPublisher

    pub = TrackMarkerPublisher()
    ms = pub.update([7, 9], np.array([[1.0, 2.0], [3.0, 4.0]]))
    assert {m["id"] for m in ms} == {7, 9}
    assert all(m["action"] == ADD for m in ms)
    # track 9 vanishes -> DELETE emitted exactly once
    ms2 = pub.update([7], np.array([[1.1, 2.1]]))
    deletes = [m for m in ms2 if m["action"] == DELETE]
    assert [m["id"] for m in deletes] == [9]
    ms3 = pub.update([7], np.array([[1.2, 2.2]]))
    assert not [m for m in ms3 if m["action"] == DELETE]


# ---------------------------------------------------------------------------
# Perception-frame record/replay + approximate time sync (BagReader parity,
# `obstacle_handling/human_tracking.py:46-111,147-152`)
# ---------------------------------------------------------------------------


def test_approx_sync_pairing():
    from kissmpc_tpu.io.frames import approx_sync

    # jittered 10 Hz streams: every image within 0.03 s of a cloud
    ts_a = [0.00, 0.10, 0.20, 0.30]
    ts_b = [0.02, 0.13, 0.18, 0.32]
    pairs = approx_sync(ts_a, ts_b, slop=0.05)
    assert pairs == [(0, 0), (1, 1), (2, 2), (3, 3)]

    # out-of-window messages are dropped, each message used at most once
    pairs = approx_sync([0.0, 1.0], [0.04, 0.06, 5.0], slop=0.1)
    assert pairs == [(0, 0)]  # nearest wins; 1.0 and 5.0 unmatched

    # empty streams
    assert approx_sync([], [0.1], slop=0.1) == []


def _synthetic_session(tmp_path, n_frames=6, jitter=0.008):
    """Record a moving human: cloud + detector masks at jittered stamps."""
    import jax.numpy as jnp

    from kissmpc_tpu.io.frames import FrameRecorder
    from kissmpc_tpu.perception import SE3, FrameGeometry, Intrinsics

    H, W, P = 48, 64, 128
    intr = Intrinsics(
        fx=jnp.float32(40.0), fy=jnp.float32(40.0),
        cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
    )
    eye = SE3(rotation=jnp.eye(3), translation=jnp.zeros(3))
    geom = FrameGeometry(
        intrinsics=intr, lidar_to_camera=eye, lidar_to_map=eye,
        image_width=W, image_height=H,
    )
    rec = FrameRecorder(geom)
    rng = np.random.default_rng(3)
    for k in range(n_frames):
        t = 0.1 * k
        # human walks +x at 1 m/s, 2 m ahead
        pts = np.zeros((P, 3), np.float32)
        pts[:40, 0] = 0.1 * k + rng.normal(0, 0.02, 40)
        pts[:40, 1] = rng.normal(0, 0.02, 40)
        pts[:40, 2] = 2.0
        mask = np.zeros(P, bool)
        mask[:40] = True
        seg = np.zeros((2, H, W), bool)
        seg[0] = True
        valid = np.array([True, False])
        rec.record_cloud(t + rng.uniform(-jitter, jitter), pts, mask)
        rec.record_image(t + rng.uniform(-jitter, jitter), seg, valid)
    path = str(tmp_path / "session.npz")
    rec.save(path)
    return path


def test_frame_replay_deterministic(tmp_path):
    from kissmpc_tpu.io.frames import FrameReplayer, replay_session
    from kissmpc_tpu.perception import TrackerConfig

    path = _synthetic_session(tmp_path)
    rep = FrameReplayer(path)
    assert len(list(rep.synced(slop=0.05))) == 6

    cfg = TrackerConfig(min_hits=1)
    state1, obs1 = replay_session(rep, cfg, capacity=4, slop=0.05)
    state2, obs2 = replay_session(FrameReplayer(path), cfg, capacity=4,
                                  slop=0.05)
    # deterministic: identical track tables and obstacle streams
    np.testing.assert_array_equal(
        np.asarray(state1.tracks.position), np.asarray(state2.tracks.position)
    )
    for a, b in zip(obs1, obs2):
        np.testing.assert_array_equal(np.asarray(a.position),
                                      np.asarray(b.position))
    # the tracker recovered the walking human: ~1 m/s in +x
    active = np.asarray(obs1[-1].active) > 0.5
    assert active.sum() == 1
    v = float(np.asarray(obs1[-1].linear_velocity)[np.argmax(active)])
    assert abs(v - 1.0) < 0.25


def test_frame_replay_pacing(tmp_path):
    from kissmpc_tpu.io.frames import FrameReplayer

    path = _synthetic_session(tmp_path, jitter=0.0)
    rep = FrameReplayer(path)
    sleeps = []
    frames = list(
        rep.synced(slop=0.05, pace=True, rate=2.0, sleep=sleeps.append)
    )
    assert len(frames) == 6
    # 5 inter-frame gaps of 0.1 s at 2x rate -> 0.05 s sleeps
    np.testing.assert_allclose(sleeps, [0.05] * 5, atol=1e-9)
