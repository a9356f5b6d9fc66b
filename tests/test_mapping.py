"""Map -> circles tooling tests (config 3 of BASELINE.md).

Own-implementation PGM reader and exact EDT validated against OpenCV (the
reference's engine, `obstacle_handling/static_obstacle.py:34`), plus greedy
packing semantics and the world-frame conversion.
"""

import os
import tempfile

import numpy as np
import pytest

from kissmpc_tpu.obstacles.mapping import (
    circles_to_world,
    distance_transform_edt,
    pack_circles,
    read_pgm,
)

cv2 = pytest.importorskip("cv2")

RRC_LAB = "/root/reference/obstacle_handling/rrc_lab.pgm"


def test_edt_matches_cv2_random():
    rng = np.random.default_rng(42)
    for _ in range(3):
        img = (rng.random((50, 70)) > 0.35).astype(np.uint8)
        mine = distance_transform_edt(img)
        theirs = cv2.distanceTransform(
            img * 255, cv2.DIST_L2, cv2.DIST_MASK_PRECISE
        )
        np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_edt_all_background_and_all_foreground():
    z = np.zeros((8, 8), dtype=np.uint8)
    np.testing.assert_allclose(distance_transform_edt(z), 0.0)
    o = np.ones((8, 8), dtype=np.uint8)
    d = distance_transform_edt(o)
    assert np.all(d >= 8)  # sentinel: no background anywhere


def test_pack_circles_single_disk():
    # A lone dark disk on a light background must be recovered as one circle
    # at its center with ~its radius.
    img = np.full((64, 64), 255, dtype=np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    img[(yy - 32) ** 2 + (xx - 20) ** 2 <= 10**2] = 0
    centers, radii = pack_circles(img, min_radius=2.0)
    assert len(radii) >= 1
    np.testing.assert_allclose(centers[0], [20.0, 32.0], atol=1.5)
    np.testing.assert_allclose(radii[0], 10.0, atol=1.0)


def test_pack_circles_reference_loop_semantics():
    # Greedy order: circles come out radius-descending, and erased disks
    # don't re-emit (the reference's `static_obstacle.py:37-56` loop).
    rng = np.random.default_rng(7)
    img = np.full((80, 80), 255, dtype=np.uint8)
    yy, xx = np.mgrid[0:80, 0:80]
    for cy, cx, r in [(20, 20, 12), (60, 55, 8), (30, 65, 5)]:
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 0
    centers, radii = pack_circles(img, min_radius=3.0)
    assert np.all(np.diff(radii) <= 1e-9)
    # the three main disks are found first, largest first
    np.testing.assert_allclose(centers[0], [20.0, 20.0], atol=1.5)
    np.testing.assert_allclose(radii[:3], [12.0, 8.0, 5.0], atol=1.2)


def test_read_pgm_roundtrip_p5():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".pgm", delete=False) as f:
        f.write(b"P5\n# a comment\n17 13\n255\n")
        f.write(img.tobytes())
        path = f.name
    try:
        out = read_pgm(path)
        np.testing.assert_array_equal(out, img)
    finally:
        os.unlink(path)


@pytest.mark.skipif(not os.path.exists(RRC_LAB), reason="reference map absent")
def test_rrc_lab_map_loads_and_packs():
    # The reference's actual occupancy map (1522x817 GIMP PNM export,
    # SURVEY.md L7 row).
    img = read_pgm(RRC_LAB)
    assert img.shape == (817, 1522)
    ref = cv2.imread(RRC_LAB, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(img, ref)
    centers, radii = pack_circles(img, min_radius=2.0, max_circles=50)
    assert len(radii) == 50
    assert radii[0] > 50  # the lab map has large occupied regions


def test_circles_to_world():
    centers = np.array([[10.0, 20.0]])
    radii = np.array([4.0])
    w_centers, w_radii = circles_to_world(
        centers, radii, resolution=0.05, origin=(-1.0, 2.0), map_height_px=100
    )
    # y flip: row 20 -> 100-1-20 = 79; scale 0.05; origin offset
    np.testing.assert_allclose(w_centers, [[-1.0 + 0.5, 2.0 + 79 * 0.05]])
    np.testing.assert_allclose(w_radii, [0.2])
