"""Tracking / control-effort costs with closed-form derivatives.

Mirrors the objective of the reference NLP (`mpc/optimizer.py:79-110`,
README "Objective Function"):

* goal tracking: sum_t (s_t - g)^T W (s_t - g), W = diag(100, 100, 50)
  (`mpc/optimizer.py:57,79-83`).  ``goal_cost_mode`` selects which timesteps
  are summed: the README's t = 1..N ("full") or the committed code's
  t = 1..N-1 ("exclude_terminal", slice ``[:, 1:-1]``).
* reverse penalty: W_v^- * sum_t min(v_t, 0)^2 in the intended ("squared")
  form (README), or the committed linear form (`mpc/optimizer.py:91-96`).
* positive-velocity penalty: W_v^+ * sum_t max(v_t, 0)^2 — present but
  commented out in the reference (`mpc/optimizer.py:85-89`).
* angular effort: W_omega * sum_t omega_t^2 (`mpc/optimizer.py:97-101`).

Each term also exposes exact per-stage gradient and (generalized) Hessian
blocks so the interior-point solver can assemble its stage-wise quadratic
model without AD.  The test-suite cross-checks against `jax.grad`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CostConfig


def _goal_mask(cfg: CostConfig, horizon: int, dtype) -> jax.Array:
    """Per-state-row inclusion mask for the goal cost, rows t = 0..N."""
    t = jnp.arange(horizon + 1)
    if cfg.goal_cost_mode == "exclude_terminal":
        mask = (t >= 1) & (t <= horizon - 1)
    else:
        mask = t >= 1
    return mask.astype(dtype)


def total_cost(
    cfg: CostConfig, states: jax.Array, controls: jax.Array, goal: jax.Array
) -> jax.Array:
    """Scalar objective.  states: [N+1, 3], controls: [N, 2], goal: [3]."""
    horizon = controls.shape[0]
    w = jnp.asarray(cfg.goal_weights, dtype=states.dtype)
    mask = _goal_mask(cfg, horizon, states.dtype)
    err = states - goal
    goal_cost = jnp.sum(mask[:, None] * (err * err) * w)

    v = controls[:, 0]
    omega = controls[:, 1]
    neg_v = jnp.minimum(v, 0.0)
    if cfg.reverse_penalty_mode == "squared":
        reverse_cost = cfg.negative_velocity_weight * jnp.sum(neg_v * neg_v)
    else:
        reverse_cost = cfg.negative_velocity_weight * jnp.sum(neg_v)
    pos_v = jnp.maximum(v, 0.0)
    forward_cost = cfg.positive_velocity_weight * jnp.sum(pos_v * pos_v)
    angular_cost = cfg.angular_velocity_weight * jnp.sum(omega * omega)
    return goal_cost + reverse_cost + forward_cost + angular_cost


def stage_gradients(
    cfg: CostConfig, states: jax.Array, controls: jax.Array, goal: jax.Array
):
    """Exact cost gradients: (gx: [N+1, 3], gu: [N, 2])."""
    horizon = controls.shape[0]
    w = jnp.asarray(cfg.goal_weights, dtype=states.dtype)
    mask = _goal_mask(cfg, horizon, states.dtype)
    gx = 2.0 * mask[:, None] * w * (states - goal)

    v = controls[:, 0]
    omega = controls[:, 1]
    neg = (v < 0.0).astype(states.dtype)
    if cfg.reverse_penalty_mode == "squared":
        dv = 2.0 * cfg.negative_velocity_weight * jnp.minimum(v, 0.0)
    else:
        dv = cfg.negative_velocity_weight * neg
    pos = (v > 0.0).astype(states.dtype)
    dv = dv + 2.0 * cfg.positive_velocity_weight * jnp.maximum(v, 0.0)
    domega = 2.0 * cfg.angular_velocity_weight * omega
    gu = jnp.stack([dv, domega], axis=-1)
    return gx, gu


def stage_hessians(
    cfg: CostConfig, states: jax.Array, controls: jax.Array
):
    """Exact (generalized) diagonal Hessian blocks.

    Returns (Hx: [N+1, 3] diagonal of d2/dx2, Hu: [N, 2] diagonal of d2/du2).
    All cost terms are separable so the Hessians are diagonal; the reverse
    penalty's generalized second derivative is 2*w^- on {v < 0}.
    """
    horizon = controls.shape[0]
    dtype = states.dtype
    w = jnp.asarray(cfg.goal_weights, dtype=dtype)
    mask = _goal_mask(cfg, horizon, dtype)
    Hx = 2.0 * mask[:, None] * jnp.broadcast_to(w, (horizon + 1, 3))

    v = controls[:, 0]
    neg = (v < 0.0).astype(dtype)
    pos = (v > 0.0).astype(dtype)
    if cfg.reverse_penalty_mode == "squared":
        hv = 2.0 * cfg.negative_velocity_weight * neg
    else:
        hv = jnp.zeros_like(v)
    hv = hv + 2.0 * cfg.positive_velocity_weight * pos
    homega = jnp.full_like(v, 2.0 * cfg.angular_velocity_weight)
    Hu = jnp.stack([hv, homega], axis=-1)
    return Hx, Hu
