"""Probe: dynamic (runtime) trip counts inside a Pallas TPU kernel.

Question for the one-binary refine plan (SCALING.md compile-time budget):
can the fused kernel's iteration count be a *runtime* SMEM scalar driving
``lax.fori_loop`` with a traced bound (lowers to a while loop in Mosaic)?
If yes, all refine stages share one compiled binary instead of one ~800 s
cold Mosaic compile per (iterations, mu_sigma) combination.

Run on TPU:  python scripts/probe_dynamic_trip.py
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(it_ref, x_ref, o_ref):
    it = it_ref[0]

    def body(_, acc):
        return acc + 1.0

    o_ref[:] = jax.lax.fori_loop(0, it, body, x_ref[:])


@jax.jit
def run(iters, x):
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(iters, x)


def main():
    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter()
    y = run(jnp.array([7], jnp.int32), x)
    v = float(y[0, 0])
    t1 = time.perf_counter()
    print(f"first call: {t1 - t0:.1f}s  value={v} (want 7.0)")
    t0 = time.perf_counter()
    y = run(jnp.array([31], jnp.int32), x)
    v = float(y[0, 0])
    t1 = time.perf_counter()
    print(f"second call (new count, no retrace): {t1 - t0:.3f}s  "
          f"value={v} (want 31.0)")
    print("PROBE", "OK" if v == 31.0 else "FAIL")


if __name__ == "__main__":
    main()
