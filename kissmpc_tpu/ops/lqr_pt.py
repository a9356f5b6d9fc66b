"""Parallel-in-time LQR via `lax.associative_scan` — O(log N) depth.

The sequential Riccati sweep (`ops/lqr.py`) has O(N) depth; fine for the
reference's horizons (N <= 50, where the scenario *batch* is the parallel
dimension — SURVEY.md section 5.7).  For long-horizon problems the TPU-native
analogue of sequence parallelism is temporal decomposition: the LQR value
functions form a monoid under composition (Sarkka & Garcia-Fernandez,
"Temporal Parallelization of Dynamic Programming and Linear Quadratic
Tracking", 2021), so the backward pass is one `associative_scan` of depth
O(log N), and the forward state recovery reuses the prefix elements.

Element of the conditional value function between two times:

    V(x_i, x_j) = min over controls of the accumulated cost, parametrized by
    (A, b, C, eta, J):  x_j reachable as A x_i + b + C-weighted freedom,
    tail cost 1/2 x'Jx - eta'x.

Composition (only (I + C_i J_j)^-1 appears; C may be singular):

    D    = (I + C_i J_j)^-1
    A_ij = A_j D A_i
    b_ij = A_j D (b_i + C_i eta_j) + b_j
    C_ij = A_j D C_i A_j' + C_j
    E    = (I + J_j C_i)^-1
    eta  = A_i' E (eta_j - J_j b_i) + eta_i
    J_ij = A_i' E J_j A_i + J_i

Stage init folds the linear control cost into the defect by completing the
square (u~ = u + Quu^-1 qu):

    A_k = A_t,  b_k = d_t - B Quu^-1 qu,  C_k = B Quu^-1 B',
    eta_k = -qx_t,  J_k = Qxx_t;    terminal: (0, 0, 0, -qx_N, Qxx_N).

Contract identical to `solve_lqr` (tested against it in tests/test_lqr_pt.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lqr import LQRData, LQRSolution


def _inv(M):
    return jnp.linalg.inv(M)


def _combine(ei, ej):
    """Associative combination of value-function elements (batched over a
    leading scan axis)."""
    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    n = Ai.shape[-1]
    I = jnp.eye(n, dtype=Ai.dtype)
    D = _inv(I + Ci @ Jj)
    E = _inv(I + Jj @ Ci)
    AjD = Aj @ D
    A = AjD @ Ai
    b = (AjD @ (bi[..., None] + Ci @ etaj[..., None]))[..., 0] + bj
    C = AjD @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj
    AiT = jnp.swapaxes(Ai, -1, -2)
    eta = (AiT @ E @ (etaj[..., None] - Jj @ bi[..., None]))[..., 0] + etai
    J = AiT @ E @ Jj @ Ai + Ji
    return (A, b, C, eta, J)


def solve_lqr_associative(data: LQRData, reg: float = 0.0) -> LQRSolution:
    """LQR solve with associative scans (same contract as `solve_lqr`).

    K/k feedback gains are not produced (zeros returned), matching the
    Pallas kernel's contract.
    """
    N, nx = data.d.shape
    nu = data.qu.shape[-1]
    dtype = data.A.dtype
    I_u = jnp.eye(nu, dtype=dtype)

    Quu_r = data.Quu + reg * I_u
    Quu_inv = jnp.linalg.inv(Quu_r)  # [N, nu, nu]
    # complete the square on the linear control cost
    u_shift = jnp.einsum("tij,tj->ti", Quu_inv, data.qu)  # Quu^-1 qu
    b_stage = data.d - jnp.einsum("tij,tj->ti", data.B, u_shift)
    C_stage = jnp.einsum(
        "tik,tkl,tjl->tij", data.B, Quu_inv, data.B
    )  # B Quu^-1 B'

    # elements 0..N-1 are stages, element N is terminal
    A_el = jnp.concatenate(
        [data.A, jnp.zeros((1, nx, nx), dtype)], axis=0
    )
    b_el = jnp.concatenate([b_stage, jnp.zeros((1, nx), dtype)], axis=0)
    C_el = jnp.concatenate(
        [C_stage, jnp.zeros((1, nx, nx), dtype)], axis=0
    )
    eta_el = -data.qx  # [N+1, nx]
    J_el = data.Qxx  # [N+1, nx, nx]

    # Backward pass: suffix combinations give the tail value function at
    # each time: V_t(x) = 1/2 x'J x - eta'x.  A reverse associative_scan
    # hands the operator (accumulated-later, new-earlier); _combine takes
    # (earlier, later), so swap.
    suffix = jax.lax.associative_scan(
        lambda a, b: _combine(b, a),
        (A_el, b_el, C_el, eta_el, J_el),
        reverse=True,
        axis=0,
    )
    _, _, _, eta_tail, J_tail = suffix  # [N+1, ...]

    # Forward pass: sequential state recovery using the tail value functions
    # (O(N) but trivially cheap; a prefix associative scan can replace it
    # for full log-depth, at the cost of a second scan).
    def fwd(dx, t):
        A_t = data.A[t]
        B_t = data.B[t]
        Jn = J_tail[t + 1]
        en = eta_tail[t + 1]
        M = Quu_r[t] + B_t.T @ Jn @ B_t
        rhs = data.qu[t] + B_t.T @ (Jn @ (A_t @ dx + data.d[t]) - en)
        du_t = -jnp.linalg.solve(M, rhs)
        dx_next = A_t @ dx + B_t @ du_t + data.d[t]
        return dx_next, (dx, du_t)

    _, (dx_head, du) = jax.lax.scan(fwd, data.d0, jnp.arange(N))
    dx_last = (
        data.A[-1] @ dx_head[-1] + data.B[-1] @ du[-1] + data.d[-1]
    )
    dx = jnp.concatenate([dx_head, dx_last[None]], axis=0)
    return LQRSolution(
        dx=dx,
        du=du,
        K=jnp.zeros((N, nu, nx), dtype),
        k=jnp.zeros((N, nu), dtype),
    )


solve_lqr_associative_batched = jax.vmap(
    solve_lqr_associative, in_axes=(0, None)
)
