"""Pallas scenario-major Riccati kernel vs the jnp oracle (interpret mode on
CPU; the same kernel compiles for TPU in bench/production paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu.ops.lqr import LQRData, solve_lqr_batched
from kissmpc_tpu.ops.pallas.riccati import solve_lqr_pallas

from .test_lqr import _random_lqr


def _batch(n, N=12, dtype=jnp.float32):
    datas = [_random_lqr(seed, N=N) for seed in range(n)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs).astype(dtype), *datas)
    return stacked


def test_pallas_matches_oracle_f32():
    data = _batch(4, N=10)
    oracle = solve_lqr_batched(data, 1e-8)
    ours = solve_lqr_pallas(data, reg=1e-8, interpret=True, bt=8)
    np.testing.assert_allclose(
        np.asarray(ours.dx), np.asarray(oracle.dx), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours.du), np.asarray(oracle.du), rtol=2e-4, atol=2e-4
    )


def test_pallas_matches_oracle_f64():
    data = _batch(3, N=8, dtype=jnp.float64)
    oracle = solve_lqr_batched(data, 0.0)
    ours = solve_lqr_pallas(data, reg=0.0, interpret=True, bt=8)
    np.testing.assert_allclose(np.asarray(ours.dx), np.asarray(oracle.dx), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours.du), np.asarray(oracle.du), atol=1e-9)


def test_pallas_nonmultiple_batch_padding():
    data = _batch(5, N=6, dtype=jnp.float64)
    oracle = solve_lqr_batched(data, 0.0)
    ours = solve_lqr_pallas(data, reg=0.0, interpret=True, bt=8)
    np.testing.assert_allclose(np.asarray(ours.du), np.asarray(oracle.du), atol=1e-9)
