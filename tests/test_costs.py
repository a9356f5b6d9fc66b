"""Unit tests: cost values and closed-form derivatives vs jax.grad.

Checks both semantic modes of SURVEY.md section 2.4 items 2 and 10:
README ("full"/"squared") and committed-code ("exclude_terminal"/"linear").
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kissmpc_tpu.config import CostConfig
from kissmpc_tpu.models import costs


def _random_traj(n=12, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    states = jax.random.normal(k1, (n + 1, 3))
    controls = jax.random.normal(k2, (n, 2))
    goal = jax.random.normal(k3, (3,))
    return states, controls, goal


@pytest.mark.parametrize(
    "mode,reverse",
    list(itertools.product(["full", "exclude_terminal"], ["squared", "linear"])),
)
def test_gradients_match_autodiff(mode, reverse):
    cfg = CostConfig(goal_cost_mode=mode, reverse_penalty_mode=reverse)
    states, controls, goal = _random_traj()
    gx, gu = costs.stage_gradients(cfg, states, controls, goal)
    agx = jax.grad(lambda s: costs.total_cost(cfg, s, controls, goal))(states)
    agu = jax.grad(lambda u: costs.total_cost(cfg, states, u, goal))(controls)
    np.testing.assert_allclose(gx, agx, atol=1e-10)
    np.testing.assert_allclose(gu, agu, atol=1e-10)


def test_goal_cost_value_reference_semantics():
    # Direct transliteration of the math: sum over selected t of
    # (s_t - g)' W (s_t - g) with W = diag(100, 100, 50)
    # (`mpc/optimizer.py:57,79-83`).
    states, controls, goal = _random_traj(8, seed=1)
    w = np.array([100.0, 100.0, 50.0])

    for mode, rows in (("full", range(1, 9)), ("exclude_terminal", range(1, 8))):
        cfg = CostConfig(
            goal_cost_mode=mode,
            negative_velocity_weight=0.0,
            angular_velocity_weight=0.0,
        )
        expected = sum(
            float(np.sum(w * (np.asarray(states[t] - goal)) ** 2)) for t in rows
        )
        got = float(costs.total_cost(cfg, states, controls, goal))
        np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_velocity_penalties():
    states = jnp.zeros((5, 3))
    controls = jnp.array([[-0.3, 0.1], [0.2, -0.4], [-0.1, 0.0], [0.5, 0.2]])
    goal = jnp.zeros(3)
    base = dict(goal_weights=(0.0, 0.0, 0.0), angular_velocity_weight=0.0)

    cfg_sq = CostConfig(reverse_penalty_mode="squared", **base)
    expected_sq = 300.0 * (0.3**2 + 0.1**2)
    np.testing.assert_allclose(
        float(costs.total_cost(cfg_sq, states, controls, goal)), expected_sq,
        rtol=1e-12,
    )

    cfg_lin = CostConfig(reverse_penalty_mode="linear", **base)
    expected_lin = 300.0 * (-0.3 - 0.1)
    np.testing.assert_allclose(
        float(costs.total_cost(cfg_lin, states, controls, goal)), expected_lin,
        rtol=1e-12,
    )

    cfg_ang = CostConfig(
        goal_weights=(0.0, 0.0, 0.0), negative_velocity_weight=0.0
    )
    expected_ang = 10.0 * (0.1**2 + 0.4**2 + 0.2**2)
    np.testing.assert_allclose(
        float(costs.total_cost(cfg_ang, states, controls, goal)), expected_ang,
        rtol=1e-12,
    )


def test_hessians_match_autodiff_away_from_kinks():
    cfg = CostConfig()
    states, controls, goal = _random_traj(10, seed=2)
    # keep v away from the min(v,0)^2 kink at 0
    controls = controls.at[:, 0].set(jnp.sign(controls[:, 0]) * (jnp.abs(controls[:, 0]) + 0.1))
    Hx, Hu = costs.stage_hessians(cfg, states, controls)
    hess_x = jax.hessian(lambda s: costs.total_cost(cfg, s, controls, goal))(states)
    hess_u = jax.hessian(lambda u: costs.total_cost(cfg, states, u, goal))(controls)
    n = states.shape[0]
    for t in range(n):
        np.testing.assert_allclose(
            np.diag(np.asarray(hess_x[t, :, t, :])), Hx[t], atol=1e-10
        )
    for t in range(controls.shape[0]):
        np.testing.assert_allclose(
            np.diag(np.asarray(hess_u[t, :, t, :])), Hu[t], atol=1e-10
        )
