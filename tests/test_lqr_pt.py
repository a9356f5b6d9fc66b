"""Parallel-in-time (associative-scan) LQR vs the sequential Riccati oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu.ops.lqr import solve_lqr
from kissmpc_tpu.ops.lqr_pt import solve_lqr_associative

from .test_lqr import _random_lqr


def test_associative_matches_riccati():
    for seed in range(3):
        data = _random_lqr(seed, N=16)
        seq = solve_lqr(data, 0.0)
        par = solve_lqr_associative(data, 0.0)
        np.testing.assert_allclose(np.asarray(par.dx), np.asarray(seq.dx), atol=1e-7)
        np.testing.assert_allclose(np.asarray(par.du), np.asarray(seq.du), atol=1e-7)


def test_associative_long_horizon():
    data = _random_lqr(42, N=256)
    seq = solve_lqr(data, 1e-9)
    par = solve_lqr_associative(data, 1e-9)
    np.testing.assert_allclose(np.asarray(par.du), np.asarray(seq.du), atol=1e-5)


def test_associative_under_jit_and_vmap():
    datas = [_random_lqr(100 + i, N=12) for i in range(3)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    from kissmpc_tpu.ops.lqr_pt import solve_lqr_associative_batched

    par = jax.jit(lambda d: solve_lqr_associative_batched(d, 0.0))(batched)
    for i, d in enumerate(datas):
        seq = solve_lqr(d, 0.0)
        np.testing.assert_allclose(
            np.asarray(par.du[i]), np.asarray(seq.du), atol=1e-7
        )
