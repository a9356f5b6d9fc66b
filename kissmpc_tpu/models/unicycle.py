"""Unicycle (differential-drive) kinematics, TPU-native.

Replaces the CasADi symbolic dynamics of the reference
(`mpc/optimizer.py:163-196`, README "Kinematic model"): forward-Euler

    x_{t+1}     = x_t + v_t * cos(theta_t) * T
    y_{t+1}     = y_t + v_t * sin(theta_t) * T
    theta_{t+1} = theta_t + omega_t * T

Everything is a pure jnp function of arrays; derivatives are closed-form
(no symbolic algebra layer, no AD in the hot path — though the test-suite
cross-checks against `jax.jacfwd`).  State layout is time-major:
``states``: [N+1, 3] rows (x, y, theta); ``controls``: [N, 2] rows (v, omega).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_STATES = 3
NUM_CONTROLS = 2


def step(state: jax.Array, control: jax.Array, dt) -> jax.Array:
    """One forward-Euler step.  state: [..., 3], control: [..., 2]."""
    x, y, theta = state[..., 0], state[..., 1], state[..., 2]
    v, omega = control[..., 0], control[..., 1]
    return jnp.stack(
        [
            x + v * jnp.cos(theta) * dt,
            y + v * jnp.sin(theta) * dt,
            theta + omega * dt,
        ],
        axis=-1,
    )


def rollout(initial_state: jax.Array, controls: jax.Array, dt) -> jax.Array:
    """Roll the dynamics out over the horizon with `lax.scan`.

    initial_state: [3]; controls: [N, 2] -> states: [N+1, 3] including the
    initial state as row 0 (matching the reference's X matrix columns,
    `mpc/optimizer.py:62-64`).
    """

    def body(state, control):
        nxt = step(state, control, dt)
        return nxt, nxt

    _, tail = jax.lax.scan(body, initial_state, controls)
    return jnp.concatenate([initial_state[None], tail], axis=0)


def defects(states: jax.Array, controls: jax.Array, dt) -> jax.Array:
    """Multiple-shooting dynamics defects d_t = f(x_t, u_t) - x_{t+1}.

    states: [N+1, 3], controls: [N, 2] -> [N, 3].  The reference encodes the
    same residuals as CasADi equality constraints with lbg = ubg = 0
    (`mpc/optimizer.py:185-196`, `:158-162`).
    """
    predicted = step(states[:-1], controls, dt)
    return predicted - states[1:]


def linearize(states: jax.Array, controls: jax.Array, dt):
    """Closed-form Jacobians of `step` along a trajectory.

    Returns (A, B): A: [N, 3, 3] = df/dx, B: [N, 3, 2] = df/du evaluated at
    (x_t, u_t) for t = 0..N-1.
    """
    theta = states[:-1, 2]
    v = controls[:, 0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    n = theta.shape[0]
    zeros = jnp.zeros_like(theta)
    ones = jnp.ones_like(theta)

    # A = I + dt * d(step)/dx nonlinear part: only theta column is nontrivial.
    A = jnp.stack(
        [
            jnp.stack([ones, zeros, -v * s * dt], axis=-1),
            jnp.stack([zeros, ones, v * c * dt], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    B = jnp.stack(
        [
            jnp.stack([c * dt, zeros], axis=-1),
            jnp.stack([s * dt, zeros], axis=-1),
            jnp.stack([zeros, ones * dt], axis=-1),
        ],
        axis=-2,
    )
    assert A.shape == (n, 3, 3) and B.shape == (n, 3, 2)
    return A, B
