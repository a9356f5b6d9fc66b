"""Scenario-major Pallas Riccati kernel — the TPU hot path of the solver.

The XLA path (`ops/lqr.py`) vmaps a per-scenario `lax.scan`, which lowers to
2N sequential steps of tiny [B, 3, 3] batched matmuls — each step pays
per-op overhead and maps terribly onto (8, 128) vector tiles (matrix dims on
the lanes).  This kernel flips the layout: the *scenario batch* lives on the
lane dimension and every small-matrix operation becomes an unrolled set of
[BT]-wide VPU ops.  The time recursion is fully unrolled (N is static), so
all indexing is static and the entire backward + forward sweep is one fused
kernel with zero HBM traffic between steps.

Memory layout: every input/output is flattened to 2-D ``[rows, BT]`` with
the (time x matrix-entry) index on rows and the scenario tile on lanes —
a [N, 3, 3, BT] array would waste VMEM on sublane padding of the size-3
dims; [N*9, BT] tiles perfectly.

This mirrors SURVEY.md section 7 item (c): "the win comes from batching
thousands of factorizations per kernel invocation (scenario-major layout),
not from per-problem parallelism."

Contract identical to `ops/lqr.py::solve_lqr_batched` (the oracle, tested in
tests/test_pallas_riccati.py): inputs LQRData with leading batch axis B,
outputs dx/du.  nx = 3, nu = 2 fixed (unicycle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lqr import LQRData, LQRSolution

BT = 512  # scenarios per kernel instance (lane tile); VMEM-bound


def _matmul(A, B):
    """[r x k] @ [k x c] of [BT]-vector entries, unrolled."""
    r, k, c = len(A), len(B), len(B[0])
    return [
        [sum(A[i][x] * B[x][j] for x in range(k)) for j in range(c)]
        for i in range(r)
    ]


def _matvec(A, v):
    return [sum(A[i][x] * v[x] for x in range(len(v))) for i in range(len(A))]


def _transpose(A):
    return [[A[i][j] for i in range(len(A))] for j in range(len(A[0]))]


def _add_mat(A, B):
    return [
        [A[i][j] + B[i][j] for j in range(len(A[0]))] for i in range(len(A))
    ]


def _add_vec(a, b):
    return [x + y for x, y in zip(a, b)]


def _inv2x2(M, reg):
    a = M[0][0] + reg
    b = M[0][1]
    c = M[1][0]
    d = M[1][1] + reg
    inv_det = 1.0 / (a * d - b * c)
    return [
        [d * inv_det, -b * inv_det],
        [-c * inv_det, a * inv_det],
    ]


def _neg_mat(A):
    return [[-x for x in row] for row in A]


def _neg_vec(a):
    return [-x for x in a]


def _read_mat(ref, t, r, c):
    """Rows t*r*c .. t*r*c + r*c of a [rows, BT] ref -> nested [BT] lists."""
    base = t * r * c
    return [[ref[base + i * c + j] for j in range(c)] for i in range(r)]


def _read_vec(ref, t, n):
    base = t * n
    return [ref[base + i] for i in range(n)]


def _riccati_kernel(
    horizon: int,
    reg: float,
    A_ref, B_ref, d_ref, d0_ref, Qxx_ref, qx_ref, Quu_ref, qu_ref,
    dx_ref, du_ref,
    K_scr, k_scr,
):
    """One program instance: full backward+forward sweep for BT scenarios.

    All refs are [rows, BT]: A N*9, B N*6, d N*3, d0 3, Qxx (N+1)*9,
    qx (N+1)*3, Quu N*4, qu N*2; outputs dx (N+1)*3, du N*2; scratch
    K N*6, k N*2.
    """
    N = horizon

    # ---- backward sweep -------------------------------------------------
    P = _read_mat(Qxx_ref, N, 3, 3)
    p = _read_vec(qx_ref, N, 3)
    for t in range(N - 1, -1, -1):
        A = _read_mat(A_ref, t, 3, 3)
        Bm = _read_mat(B_ref, t, 3, 2)
        d = _read_vec(d_ref, t, 3)
        Pd_p = _add_vec(_matvec(P, d), p)  # P d + p
        PA = _matmul(P, A)
        PB = _matmul(P, Bm)
        BmT = _transpose(Bm)
        Quu_hat = _add_mat(_read_mat(Quu_ref, t, 2, 2), _matmul(BmT, PB))
        Qux_hat = _matmul(BmT, PA)
        qu_hat = _add_vec(_read_vec(qu_ref, t, 2), _matvec(BmT, Pd_p))
        Quu_inv = _inv2x2(Quu_hat, reg)
        K = _neg_mat(_matmul(Quu_inv, Qux_hat))  # [2 x 3]
        kv = _neg_vec(_matvec(Quu_inv, qu_hat))  # [2]
        # P' = Qxx + A'PA + Qux' K ; p' = qx + A'(Pd + p) + Qux' k
        AT = _transpose(A)
        QuxT = _transpose(Qux_hat)
        P_new = _add_mat(
            _add_mat(_read_mat(Qxx_ref, t, 3, 3), _matmul(AT, PA)),
            _matmul(QuxT, K),
        )
        p_new = _add_vec(
            _add_vec(_read_vec(qx_ref, t, 3), _matvec(AT, Pd_p)),
            _matvec(QuxT, kv),
        )
        # symmetrize for numerical hygiene
        P = [
            [0.5 * (P_new[i][j] + P_new[j][i]) for j in range(3)]
            for i in range(3)
        ]
        p = p_new
        for i in range(2):
            for j in range(3):
                K_scr[t * 6 + i * 3 + j] = K[i][j]
            k_scr[t * 2 + i] = kv[i]

    # ---- forward rollout ------------------------------------------------
    dx = _read_vec(d0_ref, 0, 3)
    for i in range(3):
        dx_ref[i] = dx[i]
    for t in range(N):
        K = _read_mat(K_scr, t, 2, 3)
        kv = _read_vec(k_scr, t, 2)
        du = _add_vec(_matvec(K, dx), kv)
        for i in range(2):
            du_ref[t * 2 + i] = du[i]
        A = _read_mat(A_ref, t, 3, 3)
        Bm = _read_mat(B_ref, t, 3, 2)
        d = _read_vec(d_ref, t, 3)
        dx = _add_vec(_add_vec(_matvec(A, dx), _matvec(Bm, du)), d)
        for i in range(3):
            dx_ref[(t + 1) * 3 + i] = dx[i]


def _pad_batch(x, b_padded):
    pad = b_padded - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
    )


@functools.partial(jax.jit, static_argnames=("reg", "interpret", "bt"))
def solve_lqr_pallas(
    data: LQRData, reg: float = 0.0, interpret: bool = False, bt: int = BT
) -> LQRSolution:
    """Batched Riccati solve, scenario-major Pallas kernel.

    ``data`` leaves have a leading batch axis B (any size; padded to a
    multiple of ``bt`` internally).  Returns dx [B, N+1, 3], du [B, N, 2].
    K/k feedback gains are not returned (kernel scratch only).
    ``bt`` trades VMEM footprint against lane utilization; 512 fits
    comfortably under the 16 MB VMEM budget at N = 50 with input
    double-buffering.
    """
    BT = bt
    B = data.A.shape[0]
    N = data.A.shape[1]
    dtype = data.A.dtype
    Bp = ((B + BT - 1) // BT) * BT
    grid = (Bp // BT,)

    # scenario-major 2-D layout: [B, ...dims] -> [prod(dims), Bp]
    def to_sm(x):
        x = _pad_batch(x, Bp)
        flat = x.reshape(Bp, -1)
        return flat.T  # [rows, Bp]

    args = [
        to_sm(data.A),  # N*9
        to_sm(data.B),  # N*6
        to_sm(data.d),  # N*3
        to_sm(data.d0),  # 3
        to_sm(data.Qxx),  # (N+1)*9
        to_sm(data.qx),  # (N+1)*3
        to_sm(data.Quu),  # N*4
        to_sm(data.qu),  # N*2
    ]

    def spec(rows):
        return pl.BlockSpec(
            (rows, BT), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(_riccati_kernel, N, reg)
    dx, du = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(N * 9), spec(N * 6), spec(N * 3), spec(3),
            spec((N + 1) * 9), spec((N + 1) * 3), spec(N * 4), spec(N * 2),
        ],
        out_specs=[spec((N + 1) * 3), spec(N * 2)],
        out_shape=[
            jax.ShapeDtypeStruct(((N + 1) * 3, Bp), dtype),
            jax.ShapeDtypeStruct((N * 2, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N * 6, BT), dtype),
            pltpu.VMEM((N * 2, BT), dtype),
        ],
        interpret=interpret,
    )(*args)

    dx = dx.T.reshape(Bp, N + 1, 3)[:B]
    du = du.T.reshape(Bp, N, 2)[:B]
    empty_K = jnp.zeros((B, N, 2, 3), dtype)
    empty_k = jnp.zeros((B, N, 2), dtype)
    return LQRSolution(dx=dx, du=du, K=empty_K, k=empty_k)
