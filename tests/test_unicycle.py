"""Unit tests: unicycle dynamics, rollout, closed-form Jacobians.

Oracle: jax.jacfwd / manual forward-Euler, mirroring the dynamics the
reference encodes symbolically at `mpc/optimizer.py:163-196`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu.models import unicycle


def test_step_matches_manual():
    state = jnp.array([1.0, 2.0, 0.3])
    control = jnp.array([0.5, -0.2])
    dt = 0.041
    nxt = unicycle.step(state, control, dt)
    np.testing.assert_allclose(nxt[0], 1.0 + 0.5 * np.cos(0.3) * dt, rtol=1e-12)
    np.testing.assert_allclose(nxt[1], 2.0 + 0.5 * np.sin(0.3) * dt, rtol=1e-12)
    np.testing.assert_allclose(nxt[2], 0.3 - 0.2 * dt, rtol=1e-12)


def test_rollout_matches_iterated_step():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (3,))
    controls = jax.random.normal(jax.random.PRNGKey(1), (20, 2))
    dt = 0.1
    states = unicycle.rollout(x0, controls, dt)
    assert states.shape == (21, 3)
    x = x0
    for t in range(20):
        x = unicycle.step(x, controls[t], dt)
        np.testing.assert_allclose(states[t + 1], x, rtol=1e-12)


def test_defects_zero_on_rollout():
    x0 = jnp.array([0.5, -1.0, 2.0])
    controls = jax.random.normal(jax.random.PRNGKey(2), (15, 2))
    states = unicycle.rollout(x0, controls, 0.05)
    d = unicycle.defects(states, controls, 0.05)
    np.testing.assert_allclose(d, 0.0, atol=1e-12)


def test_linearize_matches_jacfwd():
    dt = 0.041
    states = jax.random.normal(jax.random.PRNGKey(3), (11, 3))
    controls = jax.random.normal(jax.random.PRNGKey(4), (10, 2))
    A, B = unicycle.linearize(states, controls, dt)
    fA = jax.vmap(jax.jacfwd(lambda x, u: unicycle.step(x, u, dt), argnums=0))(
        states[:-1], controls
    )
    fB = jax.vmap(jax.jacfwd(lambda x, u: unicycle.step(x, u, dt), argnums=1))(
        states[:-1], controls
    )
    np.testing.assert_allclose(A, fA, atol=1e-12)
    np.testing.assert_allclose(B, fB, atol=1e-12)
