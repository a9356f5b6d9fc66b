"""Native (C++) component tests: EDT + packing vs the numpy oracle."""

import numpy as np
import pytest

from kissmpc_tpu import native
from kissmpc_tpu.obstacles import mapping

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_edt_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    for _ in range(3):
        fg = (rng.random((40, 60)) > 0.4).astype(np.uint8)
        d_native = native.edt(fg)
        d_numpy = mapping.distance_transform_edt(fg)
        np.testing.assert_allclose(d_native, d_numpy, atol=1e-5)


def test_native_packing_matches_numpy_path():
    img = np.full((64, 64), 255, dtype=np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    for cy, cx, r in [(20, 20, 11), (45, 50, 7)]:
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 0
    cn, rn = mapping.pack_circles(img, min_radius=3.0, use_native=True)
    cp, rp = mapping.pack_circles(img, min_radius=3.0, use_native=False)
    assert len(rn) == len(rp)
    np.testing.assert_allclose(cn, cp, atol=1e-4)
    np.testing.assert_allclose(rn, rp, atol=1e-4)


def test_native_is_default_and_fast():
    import time

    rng = np.random.default_rng(1)
    img = (rng.random((400, 400)) * 255).astype(np.uint8)
    t0 = time.time()
    mapping.pack_circles(img, min_radius=2.0, max_circles=50)
    assert time.time() - t0 < 2.0  # numpy path takes >5s at this size
