"""Grid-Dijkstra global planner (planner.py) — geometric unit tests."""

import numpy as np

from kissmpc_tpu.planner import plan_waypoint_chain

INFL = 0.4


def _chain(starts, wps, centers, radii, static=None, **kw):
    B = starts.shape[0]
    K = centers.shape[1]
    if static is None:
        static = np.ones((B, K), bool)
    return plan_waypoint_chain(
        np.asarray(starts, np.float32), np.asarray(wps, np.float32),
        np.asarray(centers, np.float32), np.asarray(radii, np.float32),
        static, INFL, **kw,
    )


def test_routes_around_wall_with_gap():
    # A 3-circle wall across the straight line, with a gap at y=+1.6 the
    # planner must thread; the detour router's single perpendicular push
    # cannot see such a gap in general.
    start = np.array([[0.0, 0.0, 0.0]])
    wps = np.array([[[4.0, 0.0, 0.0]]])
    centers = np.array([[[2.0, -0.9], [2.0, 0.0], [2.0, 0.9]]])
    radii = np.full((1, 3), 0.35)
    out, reach = _chain(start, wps, centers, radii, points_per_leg=4)
    assert bool(reach.all()), "gap exists -> leg must be reachable"
    assert out.shape == (1, 5, 3)
    # every routed point clear of every inflated disk
    d = np.linalg.norm(
        out[0, :, None, :2] - centers[0][None], axis=-1
    ) - (radii[0][None] + INFL)
    assert d.min() > 0.0, f"routed point inside inflated disk: {d.min():.3f}"
    # the original waypoint survives verbatim as the chain end
    np.testing.assert_allclose(out[0, -1], wps[0, 0], atol=1e-6)
    # the route actually detours (not the straight line)
    assert np.abs(out[0, :4, 1]).max() > 0.9


def test_unreachable_target_flagged():
    # Target fully enclosed by overlapping inflated circles -> leg reported
    # unreachable, straight-line fallback keeps the output finite.
    start = np.array([[0.0, 0.0, 0.0]])
    wps = np.array([[[3.0, 0.0, 0.0]]])
    ang = np.linspace(0, 2 * np.pi, 9)[:-1]
    centers = np.stack(
        [3.0 + 0.9 * np.cos(ang), 0.9 * np.sin(ang)], axis=-1
    )[None]
    radii = np.full((1, 8), 0.3)
    out, reach = _chain(start, wps, centers, radii)
    assert not bool(reach[0, 0])
    assert np.isfinite(out).all()
    # fallback = straight resample
    assert np.abs(out[0, :3, 1]).max() < 1e-5


def test_multi_leg_chain_and_headings():
    rng = np.random.default_rng(3)
    B, W, K, P = 16, 3, 6, 3
    starts = np.concatenate(
        [rng.uniform(-1, 1, (B, 2)), np.zeros((B, 1))], axis=1
    )
    wps = np.cumsum(
        np.concatenate(
            [rng.uniform(0.5, 1.5, (B, W, 2)), rng.uniform(-3, 3, (B, W, 1))],
            axis=2,
        ),
        axis=1,
    )
    wps[..., :2] += starts[:, None, :2]
    centers = rng.uniform(-1, 4, (B, K, 2))
    radii = rng.uniform(0.1, 0.3, (B, K))
    # clear endpoints (generator invariant)
    for p in [starts[:, :2]] + [wps[:, w, :2] for w in range(W)]:
        for _ in range(4):
            d = centers - p[:, None, :]
            dist = np.maximum(np.linalg.norm(d, axis=-1), 1e-6)
            push = np.maximum(radii + INFL + 0.15 - dist, 0.0)
            centers += d / dist[..., None] * push[..., None]
    out, reach = _chain(starts, wps, centers, radii, points_per_leg=P)
    assert out.shape == (B, W * (P + 1), 3)
    # original waypoints preserved at their slots
    for w in range(W):
        np.testing.assert_allclose(
            out[:, w * (P + 1) + P], wps[:, w], atol=1e-6
        )
    # reachable-leg route points stay clear of inflated disks
    clear = np.linalg.norm(
        out[:, :, None, :2] - centers[:, None], axis=-1
    ) - (radii[:, None, :] + INFL)
    leg_ok = np.repeat(reach, P + 1, axis=1)  # [B, W*(P+1)]
    route_rows = np.tile(
        np.arange(W * (P + 1)) % (P + 1) != P, (B, 1)
    )
    viol = (clear.min(axis=2) < -1e-3) & leg_ok & route_rows
    assert not viol.any(), f"{viol.sum()} routed points inside disks"
    # headings point at the successor
    j = 0  # first route point of leg 0
    d = out[:, j + 1, :2] - out[:, j, :2]
    nz = np.linalg.norm(d, axis=1) > 1e-6
    np.testing.assert_allclose(
        out[nz, j, 2], np.arctan2(d[nz, 1], d[nz, 0]), atol=1e-5
    )


def test_bottleneck_clearance_signs():
    # Open corridor -> comfortably positive margin; enclosed target ->
    # negative (every path must violate the inflated constraint).
    from kissmpc_tpu.planner import bottleneck_clearance

    starts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]], np.float32)
    goals = np.array([[3.0, 0.0, 0.0], [3.0, 0.0, 0.0]], np.float32)
    ang = np.linspace(0, 2 * np.pi, 9)[:-1]
    ring = np.stack(
        [3.0 + 0.9 * np.cos(ang), 0.9 * np.sin(ang)], axis=-1
    )
    far = np.tile(np.array([[20.0, 20.0]], np.float32), (8, 1))
    centers = np.stack([far, ring]).astype(np.float32)  # [2, 8, 2]
    radii = np.full((2, 8), 0.3, np.float32)
    static = np.ones((2, 8), bool)
    w = bottleneck_clearance(starts, goals, centers, radii, static, INFL)
    assert w[0] > 0.5, w  # wide open
    assert w[1] < 0.05, w  # enclosed: no comfortable path exists


def test_episode_worlds_return_info():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.scenarios import episode_worlds

    cfg = MPCConfig(horizon=16, time_step=0.1, max_obstacles=4)
    env, obs, info = episode_worlds(
        cfg, 8, n_waypoints=2, seed=0, n_dynamic=1,
        route_around_obstacles=True, router="grid", return_info=True,
    )
    reach = np.asarray(info["leg_reachable"])
    assert reach.shape == (8, 2) and reach.dtype == bool
    # two-tuple by default (backward compatible)
    out = episode_worlds(
        cfg, 8, n_waypoints=2, seed=0, n_dynamic=1,
        route_around_obstacles=True, router="grid",
    )
    assert len(out) == 2
    # K == 0: leg_reachable must still be a [B, W] bool array (ADVICE r4:
    # a shadowed local used to leak the float hop length here).
    cfg0 = MPCConfig(horizon=16, time_step=0.1, max_obstacles=0)
    _, _, info0 = episode_worlds(
        cfg0, 4, n_waypoints=3, seed=0, return_info=True,
    )
    reach0 = np.asarray(info0["leg_reachable"])
    assert reach0.shape == (4, 3) and reach0.dtype == bool
    assert reach0.all()
