"""Block-tridiagonal LQR / Riccati solver — the Newton-KKT engine.

The reference hands its KKT systems to IPOPT's general sparse factorization
(MUMPS) inside `ca.nlpsol` (`mpc/optimizer.py:344-354`).  The KKT matrix of an
optimal-control QP is block-tridiagonal in time, so TPU-native we factorize it
with a Riccati backward sweep + forward rollout instead: O(N (nx+nu)^3) work,
expressed as a `lax.scan` of tiny dense ops that `jax.vmap` batches across
thousands of scenarios (SURVEY.md sections 5.7, 7.3-7.4).

Subproblem solved here (all arrays time-major):

    min  sum_t  1/2 dx_t' Qxx_t dx_t + qx_t' dx_t        (t = 0..N)
         + sum_t 1/2 du_t' Quu_t du_t + qu_t' du_t        (t = 0..N-1)
    s.t. dx_{t+1} = A_t dx_t + B_t du_t + d_t,   dx_0 = d0

The affine defect terms d_t carry the multiple-shooting dynamics residuals
(Mayne-style DDP with defects), and d0 the initial-state pin residual —
together they implement the equality constraints the reference encodes at
`mpc/optimizer.py:163-196` with lbg = ubg = 0.

A scenario-major Pallas kernel (`kissmpc_tpu.ops.pallas.riccati`) implements
the same contract for the TPU hot path; this jnp version is its oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LQRData(NamedTuple):
    A: jax.Array  # [N, 3, 3]
    B: jax.Array  # [N, 3, 2]
    d: jax.Array  # [N, 3]   defect: f(x_t, u_t) - x_{t+1}
    d0: jax.Array  # [3]      initial pin residual: x_init - x_0
    Qxx: jax.Array  # [N+1, 3, 3]
    qx: jax.Array  # [N+1, 3]
    Quu: jax.Array  # [N, 2, 2]
    qu: jax.Array  # [N, 2]


class LQRSolution(NamedTuple):
    dx: jax.Array  # [N+1, 3]
    du: jax.Array  # [N, 2]
    # Feedback gains from the backward pass (useful for warm starts and for
    # closed-loop rollouts; not used by the IPM line search itself).
    K: jax.Array  # [N, 2, 3]
    k: jax.Array  # [N, 2]


def _inv2x2(M: jax.Array, reg) -> jax.Array:
    """Closed-form inverse of a (batched) 2x2 with diagonal regularization."""
    a = M[..., 0, 0] + reg
    b = M[..., 0, 1]
    c = M[..., 1, 0]
    d = M[..., 1, 1] + reg
    det = a * d - b * c
    inv_det = 1.0 / det
    return jnp.stack(
        [
            jnp.stack([d * inv_det, -b * inv_det], axis=-1),
            jnp.stack([-c * inv_det, a * inv_det], axis=-1),
        ],
        axis=-2,
    )


def solve_lqr(data: LQRData, reg: float = 0.0) -> LQRSolution:
    """Riccati solve of one LQR subproblem (vmap over a leading batch axis)."""

    def backward(carry, inputs):
        P, p = carry  # value function: V(dx) = 1/2 dx'Pdx + p'dx + const
        A, B, d, Qxx, qx, Quu, qu = inputs
        Pd_p = P @ d + p  # [3]
        PA = P @ A  # [3,3]
        PB = P @ B  # [3,2]
        Quu_hat = Quu + B.T @ PB  # [2,2]
        Qux_hat = B.T @ PA  # [2,3]
        qu_hat = qu + B.T @ Pd_p  # [2]
        Quu_inv = _inv2x2(Quu_hat, reg)
        K = -(Quu_inv @ Qux_hat)  # [2,3]
        k = -(Quu_inv @ qu_hat)  # [2]
        P_new = Qxx + A.T @ PA + Qux_hat.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qx + A.T @ Pd_p + Qux_hat.T @ k
        return (P_new, p_new), (K, k)

    init = (data.Qxx[-1], data.qx[-1])
    inputs = (
        data.A,
        data.B,
        data.d,
        data.Qxx[:-1],
        data.qx[:-1],
        data.Quu,
        data.qu,
    )
    _, (K, k) = jax.lax.scan(backward, init, inputs, reverse=True)

    def forward(dx, inputs):
        A, B, d, K_t, k_t = inputs
        du = K_t @ dx + k_t
        dx_next = A @ dx + B @ du + d
        return dx_next, (dx, du)

    _, (dx_head, du) = jax.lax.scan(
        forward, data.d0, (data.A, data.B, data.d, K, k)
    )
    # dx_head are dx_0..dx_{N-1}; recompute dx_N from the last transition.
    dx_last = (
        data.A[-1] @ dx_head[-1] + data.B[-1] @ du[-1] + data.d[-1]
    )
    dx = jnp.concatenate([dx_head, dx_last[None]], axis=0)
    return LQRSolution(dx=dx, du=du, K=K, k=k)


solve_lqr_batched = jax.vmap(solve_lqr, in_axes=(0, None))


def kkt_residual(data: LQRData, sol: LQRSolution) -> jax.Array:
    """Inf-norm KKT residual of an LQR solution (test utility).

    Uses the adjoint recursion lambda_N = Qxx_N dx_N + qx_N;
    lambda_t = Qxx_t dx_t + qx_t + A_t' lambda_{t+1} and checks the control
    stationarity Quu du + qu + B' lambda_{t+1} = 0 plus dynamics feasibility.
    """
    dx, du = sol.dx, sol.du

    def adjoint(lam_next, inputs):
        A, Qxx, qx, dx_t = inputs
        lam = Qxx @ dx_t + qx + A.T @ lam_next
        return lam, lam_next

    lam_N = data.Qxx[-1] @ dx[-1] + data.qx[-1]
    _, lam_next = jax.lax.scan(
        adjoint,
        lam_N,
        (data.A, data.Qxx[:-1], data.qx[:-1], dx[:-1]),
        reverse=True,
    )
    stat = jnp.einsum("tij,tj->ti", data.Quu, du) + data.qu + jnp.einsum(
        "tji,tj->ti", data.B, lam_next
    )
    dyn = (
        jnp.einsum("tij,tj->ti", data.A, dx[:-1])
        + jnp.einsum("tij,tj->ti", data.B, du)
        + data.d
        - dx[1:]
    )
    pin = data.d0 - dx[0]
    return jnp.maximum(
        jnp.max(jnp.abs(stat)),
        jnp.maximum(jnp.max(jnp.abs(dyn)), jnp.max(jnp.abs(pin))),
    )
