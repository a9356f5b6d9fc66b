"""Riccati LQR solver vs a dense KKT oracle.

Builds the full (z, lambda) KKT system of the equality-constrained LQR with
defects and solves it densely with numpy; the Riccati sweep must match to
near machine precision.  This validates the Newton-KKT engine that replaces
IPOPT's sparse factorization (`mpc/optimizer.py:344-354`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu.ops.lqr import LQRData, kkt_residual, solve_lqr, solve_lqr_batched


def _random_lqr(seed, N=12, nx=3, nu=2):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(N, nx, nx)) * 0.4 + np.eye(nx)
    B = rng.normal(size=(N, nx, nu)) * 0.5
    d = rng.normal(size=(N, nx)) * 0.1
    d0 = rng.normal(size=(nx,)) * 0.1

    def spd(n, scale):
        m = rng.normal(size=(n, n))
        return m @ m.T * scale + np.eye(n) * 0.5

    Qxx = np.stack([spd(nx, 0.3) for _ in range(N + 1)])
    Quu = np.stack([spd(nu, 0.3) for _ in range(N)])
    qx = rng.normal(size=(N + 1, nx))
    qu = rng.normal(size=(N, nu))
    return LQRData(
        A=jnp.asarray(A), B=jnp.asarray(B), d=jnp.asarray(d), d0=jnp.asarray(d0),
        Qxx=jnp.asarray(Qxx), qx=jnp.asarray(qx),
        Quu=jnp.asarray(Quu), qu=jnp.asarray(qu),
    )


def _dense_solve(data: LQRData):
    """Dense KKT oracle: variables z = [x_0..x_N, u_0..u_{N-1}]."""
    A = np.asarray(data.A)
    B = np.asarray(data.B)
    N, nx, nu = B.shape
    nz = (N + 1) * nx + N * nu
    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for t in range(N + 1):
        H[t * nx : (t + 1) * nx, t * nx : (t + 1) * nx] = np.asarray(data.Qxx[t])
        g[t * nx : (t + 1) * nx] = np.asarray(data.qx[t])
    off = (N + 1) * nx
    for t in range(N):
        H[off + t * nu : off + (t + 1) * nu, off + t * nu : off + (t + 1) * nu] = (
            np.asarray(data.Quu[t])
        )
        g[off + t * nu : off + (t + 1) * nu] = np.asarray(data.qu[t])
    # constraints: x_0 = d0; x_{t+1} = A x_t + B u_t + d_t
    nc = (N + 1) * nx
    C = np.zeros((nc, nz))
    b = np.zeros(nc)
    C[:nx, :nx] = np.eye(nx)
    b[:nx] = np.asarray(data.d0)
    for t in range(N):
        r = (t + 1) * nx
        C[r : r + nx, (t + 1) * nx : (t + 2) * nx] = -np.eye(nx)
        C[r : r + nx, t * nx : (t + 1) * nx] = A[t]
        C[r : r + nx, off + t * nu : off + (t + 1) * nu] = B[t]
        b[r : r + nx] = -np.asarray(data.d[t])
    KKT = np.block([[H, C.T], [C, np.zeros((nc, nc))]])
    rhs = np.concatenate([-g, b])
    sol = np.linalg.solve(KKT, rhs)
    z = sol[:nz]
    xs = z[: (N + 1) * nx].reshape(N + 1, nx)
    us = z[(N + 1) * nx :].reshape(N, nu)
    return xs, us


def test_riccati_matches_dense_kkt():
    for seed in range(3):
        data = _random_lqr(seed)
        sol = solve_lqr(data, 0.0)
        xs, us = _dense_solve(data)
        np.testing.assert_allclose(sol.dx, xs, atol=1e-8)
        np.testing.assert_allclose(sol.du, us, atol=1e-8)
        assert float(kkt_residual(data, sol)) < 1e-8


def test_riccati_batched_matches_loop():
    datas = [_random_lqr(100 + i) for i in range(4)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    bsol = solve_lqr_batched(batched, 0.0)
    for i, data in enumerate(datas):
        sol = solve_lqr(data, 0.0)
        np.testing.assert_allclose(bsol.dx[i], sol.dx, atol=1e-10)
        np.testing.assert_allclose(bsol.du[i], sol.du, atol=1e-10)
