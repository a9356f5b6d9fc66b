"""Obstacle model — TPU-native rebuild of `obstacle_handling/`.

The reference models obstacles as a Python class hierarchy (`Obstacle` ABC,
`StaticObstacle`, `DynamicObstacle` — `obstacle_handling/obstacle.py:5,28`,
`obstacle_handling/dynamic_obstacle.py:7`) whose instances are filtered into
per-tick Python lists (`mpc/environment.py:48-65`) and looped over during NLP
assembly.  TPU-native, an obstacle *population* is one fixed-size struct of
arrays with an activity mask; static obstacles are simply the zero-velocity
special case, and per-tick variation is data, never shape.

Repairs relative to the reference (SURVEY.md section 2.4):
 * numeric point-circle distance is ``|p - c| - r`` (the reference computes
   ``norm((p - c) - r)``, elementwise radius inside the norm —
   `obstacle_handling/geometry.py:44`; its *symbolic* twin at `:46-51` is
   correct and is what we match);
 * constant-velocity prediction uses radians throughout (the reference
   re-applies ``deg2rad`` to an already-radian heading,
   `obstacle_handling/dynamic_obstacle.py:24-25`);
 * predicted tracks are honored per-timestep for dynamic obstacles (the
   reference's vectorized fast path froze them at the current center,
   `mpc/optimizer.py:219-221`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Reference defaults (`obstacle_handling/dynamic_obstacle.py:8-9,21`).
HUMAN_RADIUS = 0.3
PREDICTION_DT = 0.1


class ObstacleSet(NamedTuple):
    """Fixed-size population of circular obstacles (struct of arrays).

    All arrays share leading dim K.  ``active`` masks padding slots.  A
    static obstacle has zero velocities; a dynamic (human) obstacle carries
    the constant-velocity unicycle state of the reference's `DynamicObstacle`.
    """

    position: jax.Array  # [K, 2]
    radius: jax.Array  # [K]
    orientation: jax.Array  # [K]  heading (radians)
    linear_velocity: jax.Array  # [K]
    angular_velocity: jax.Array  # [K]
    active: jax.Array  # [K]  1.0 = real, 0.0 = padding

    @property
    def size(self) -> int:
        return self.position.shape[0]


def empty(max_obstacles: int, dtype=jnp.float32) -> ObstacleSet:
    K = max_obstacles
    z = jnp.zeros((K,), dtype)
    return ObstacleSet(
        position=jnp.zeros((K, 2), dtype),
        radius=z,
        orientation=z,
        linear_velocity=z,
        angular_velocity=z,
        active=z,
    )


def static_set(centers, radii, max_obstacles=None, dtype=jnp.float32) -> ObstacleSet:
    """Build a (padded) static obstacle population from circle arrays."""
    centers = jnp.asarray(centers, dtype).reshape(-1, 2)
    radii = jnp.asarray(radii, dtype).reshape(-1)
    n = centers.shape[0]
    K = max_obstacles if max_obstacles is not None else n
    assert n <= K, f"{n} obstacles > capacity {K}"
    out = empty(K, dtype)
    mask = (jnp.arange(K) < n).astype(dtype)
    pad = lambda x, full: full.at[:n].set(x) if n else full
    return out._replace(
        position=pad(centers, out.position),
        radius=pad(radii, out.radius),
        active=mask,
    )


def dynamic_set(
    positions,
    orientations,
    linear_velocities,
    angular_velocities=None,
    radius=HUMAN_RADIUS,
    max_obstacles=None,
    dtype=jnp.float32,
) -> ObstacleSet:
    """Build a (padded) dynamic-obstacle population (reference humans:
    radius 0.3, default v = 1.0, `obstacle_handling/dynamic_obstacle.py:8-9`).
    """
    positions = jnp.asarray(positions, dtype).reshape(-1, 2)
    n = positions.shape[0]
    orientations = jnp.broadcast_to(jnp.asarray(orientations, dtype), (n,))
    linear_velocities = jnp.broadcast_to(
        jnp.asarray(linear_velocities, dtype), (n,)
    )
    if angular_velocities is None:
        angular_velocities = jnp.zeros((n,), dtype)
    else:
        angular_velocities = jnp.broadcast_to(
            jnp.asarray(angular_velocities, dtype), (n,)
        )
    K = max_obstacles if max_obstacles is not None else n
    assert n <= K
    out = empty(K, dtype)
    mask = (jnp.arange(K) < n).astype(dtype)
    pad = lambda x, full: full.at[:n].set(x) if n else full
    return out._replace(
        position=pad(positions, out.position),
        radius=pad(jnp.full((n,), radius, dtype), out.radius),
        orientation=pad(orientations, out.orientation),
        linear_velocity=pad(linear_velocities, out.linear_velocity),
        angular_velocity=pad(angular_velocities, out.angular_velocity),
        active=mask,
    )


def concatenate(a: ObstacleSet, b: ObstacleSet) -> ObstacleSet:
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def distance_to_point(obs: ObstacleSet, point) -> jax.Array:
    """Signed surface distance |p - c| - r per obstacle ([K]).

    This is the *repaired* numeric distance (reference bug 2.4-4); inactive
    slots report +inf so they never pass a sensor filter.
    """
    p = jnp.asarray(point)[..., :2]
    d = jnp.linalg.norm(obs.position - p, axis=-1) - obs.radius
    return jnp.where(obs.active > 0.5, d, jnp.inf)


def predict_tracks(obs: ObstacleSet, horizon: int, dt: float = PREDICTION_DT):
    """Constant-velocity unicycle forward prediction -> centers [K, N, 2].

    Track column t is the obstacle position after t prediction steps
    (column 0 = current position), matching the intended indexing of
    `obstacle_handling/dynamic_obstacle.py:30-37` against the NLP's states
    X[:, 1:] (`mpc/optimizer.py:211`): the constraint at state t+1 uses
    column t.  Static obstacles (zero velocity) yield constant tracks.
    """

    # Closed form over the horizon instead of a sequential scan: the
    # original 50-step `lax.scan` carried a tiny [K] state, which under a
    # B=2048 vmap is latency-bound (50 dependent micro-steps on device) and
    # showed up as several ms of the fleet tick's problem-construction
    # phase (scripts/profile_fleet_tick.py).  Step j's displacement is
    # v*dt*[cos, sin](theta0 + j*w*dt); position after t steps is the
    # prefix sum, which XLA lowers as a log-depth cumsum.  Identical model
    # (per-step heading update then move), f32 association differs only in
    # the cumsum tree.
    j = jnp.arange(horizon, dtype=obs.position.dtype)  # [N]
    theta_j = (
        obs.orientation[..., None]
        + obs.angular_velocity[..., None] * dt * j
    )  # [K, N]
    step = (obs.linear_velocity * dt)[..., None, None] * jnp.stack(
        [jnp.cos(theta_j), jnp.sin(theta_j)], axis=-1
    )  # [K, N, 2]
    cs = jnp.cumsum(step[..., :-1, :], axis=-2)
    return obs.position[..., None, :] + jnp.concatenate(
        [jnp.zeros_like(step[..., :1, :]), cs], axis=-2
    )  # [K, N, 2]; column 0 = current position


def advance(obs: ObstacleSet, dt: float) -> ObstacleSet:
    """One world-clock step of the constant-velocity unicycle obstacle model.

    The closed-loop counterpart of `predict_tracks`: where prediction rolls
    the model forward *hypothetically* over the plan horizon, this moves the
    actual obstacle state by one environment tick (the reference's humans
    move in the world between solves; its simulation loop keeps them frozen,
    which makes closed-loop clearance unmeasurable).  Inactive slots don't
    move.
    """
    act = obs.active > 0.5
    new_pos = obs.position + jnp.where(
        act[..., None],
        jnp.stack(
            [
                obs.linear_velocity * jnp.cos(obs.orientation) * dt,
                obs.linear_velocity * jnp.sin(obs.orientation) * dt,
            ],
            axis=-1,
        ),
        0.0,
    )
    new_theta = obs.orientation + jnp.where(
        act, obs.angular_velocity * dt, 0.0
    )
    return obs._replace(position=new_pos, orientation=new_theta)


def clearance_to_point(obs: ObstacleSet, point, robot_radius: float = 0.0):
    """True (uninflated) physical clearance min_k |p - c_k| - r_k - r_robot.

    The safety observable: negative means the robot disk overlaps an
    obstacle disk — an actual collision, not a constraint-margin event
    (the solver's constraints use the *inflated* radius, reference
    `mpc/agent.py:149`).  Inactive slots report +inf.
    """
    d = distance_to_point(obs, point) - robot_radius
    return jnp.min(d, axis=-1)


def select_nearest(
    obs: ObstacleSet, point, sensor_radius: float, k: int
) -> ObstacleSet:
    """Top-k nearest active obstacles within the sensor radius, as a fixed-size
    masked set.

    TPU-native replacement for the reference's sort-and-filter over Python
    lists (`mpc/environment.py:48-65`, sensor radius default 5,
    `mpc/agent.py:101`).  Note the reference keys a dict by distance and
    silently drops ties; top_k keeps them.
    """
    d = distance_to_point(obs, point)  # inf for inactive
    neg = jnp.where(jnp.isfinite(d), -d, -jnp.inf)
    _, idx = jax.lax.top_k(neg, k)  # k smallest distances
    chosen = jax.tree.map(lambda x: x[idx], obs)
    within = distance_to_point(chosen, point) <= sensor_radius
    return chosen._replace(
        active=chosen.active * within.astype(chosen.active.dtype)
    )
