"""Test configuration: force an 8-device CPU mesh and float64.

The driver environment registers an experimental TPU plugin ('axon') and
pins ``jax_platforms`` via sitecustomize; tests override it back to CPU with
8 virtual devices so sharding logic is exercised without TPU hardware
(SURVEY.md section 4, point 4).  x64 is enabled so solver algorithm tests are
not limited by f32 rounding; dedicated f32 tests cast explicitly.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
