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


def test_mailbox_roundtrip_and_versions():
    from kissmpc_tpu.native import Mailbox

    mb = Mailbox.create(8)
    if mb is None:
        pytest.skip("native toolchain unavailable")
    val, v = mb.read()
    assert val is None and v == 0
    assert mb.publish(np.arange(5.0)) == 1
    val, v = mb.read()
    assert v == 1
    np.testing.assert_array_equal(val, np.arange(5.0))
    assert mb.publish(np.ones(3)) == 2
    val, v = mb.read()
    assert v == 2 and val.shape == (3,)
    mb.close()


def test_mailbox_no_torn_reads_under_contention():
    # Hammer the seqlock from a writer thread publishing internally
    # consistent payloads (all elements equal); any torn read shows up as a
    # mixed payload.  ctypes releases the GIL inside publish/read, so this
    # exercises genuine concurrency.
    import threading

    from kissmpc_tpu.native import Mailbox

    n = 256
    mb = Mailbox.create(n)
    if mb is None:
        pytest.skip("native toolchain unavailable")
    stop = threading.Event()

    def writer():
        i = 0.0
        buf = np.empty(n)
        while not stop.is_set():
            buf.fill(i)
            mb.publish(buf)
            i += 1.0

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    torn = 0
    last_v = 0
    reads = 0
    try:
        import time as _time

        deadline = _time.time() + 2.0
        while _time.time() < deadline:
            val, v = mb.read()
            if val is None:
                continue
            reads += 1
            assert v >= last_v, "versions must be monotonic"
            last_v = v
            if not np.all(val == val[0]):
                torn += 1
    finally:
        stop.set()
        t.join(timeout=5)
    assert reads > 100, f"only {reads} reads"
    assert torn == 0, f"{torn} torn reads out of {reads}"
    assert last_v > 100, "writer barely progressed"
    mb.close()


def test_native_latest_value_in_control_loop():
    # NativeLatestValue is a drop-in for LatestValue in the ControlLoop.
    from kissmpc_tpu.io.pubsub import NativeLatestValue

    odom = NativeLatestValue.create((3,))
    if odom is None:
        pytest.skip("native toolchain unavailable")
    odom.publish(np.array([0.5, 0.25, 0.1]))
    val, v = odom.read()
    assert v == 1
    np.testing.assert_allclose(val, [0.5, 0.25, 0.1])
    # shape round-trip for a plan payload
    plan = NativeLatestValue.create((4, 3))
    wps = np.arange(12.0).reshape(4, 3)
    plan.publish(wps)
    val, v = plan.read()
    np.testing.assert_array_equal(val, wps)
    odom.close()
    plan.close()
