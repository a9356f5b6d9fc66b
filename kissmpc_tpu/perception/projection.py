"""Camera/LiDAR geometry — pure-jnp rebuild of the perception node's math.

The reference's `DetectorNode` (`obstacle_handling/human_tracking.py`)
projects LiDAR points into the camera through a hardcoded extrinsic
(`:192-200`) and `CameraInfo` intrinsics (`:174-177,235-236`), masks them by
each track's segmentation mask (`:250-257`), and transforms centers to the
map frame (`:285-294`).  Here each stage is a pure array function — batched,
jit-able, with fixed shapes (point clouds padded + masked).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SE3(NamedTuple):
    """Rigid 3-D transform as rotation matrix + translation."""

    rotation: jax.Array  # [3, 3]
    translation: jax.Array  # [3]

    @staticmethod
    def from_quaternion(translation, quat) -> "SE3":
        """(x, y, z, w) quaternion + translation -> SE3 (the reference's
        hardcoded lidar->camera extrinsic is given in this form,
        `human_tracking.py:192-200`)."""
        x, y, z, w = (
            jnp.asarray(quat)[0],
            jnp.asarray(quat)[1],
            jnp.asarray(quat)[2],
            jnp.asarray(quat)[3],
        )
        R = jnp.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        return SE3(rotation=R, translation=jnp.asarray(translation))

    def apply(self, points: jax.Array) -> jax.Array:
        """[..., 3] -> [..., 3]."""
        return points @ self.rotation.T + self.translation

    def inverse(self) -> "SE3":
        RT = self.rotation.T
        return SE3(rotation=RT, translation=-(RT @ self.translation))

    def compose(self, other: "SE3") -> "SE3":
        return SE3(
            rotation=self.rotation @ other.rotation,
            translation=self.rotation @ other.translation + self.translation,
        )


class Intrinsics(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def from_matrix(K) -> "Intrinsics":
        K = jnp.asarray(K).reshape(3, 3)
        return Intrinsics(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2])


def range_filter(points: jax.Array, mask: jax.Array, max_range: float):
    """Keep points within ``max_range`` of the sensor (<= 5 m in the
    reference, `human_tracking.py:223-225`).  mask: [P] validity."""
    r = jnp.linalg.norm(points, axis=-1)
    return mask & (r <= max_range)


def project_points(
    intr: Intrinsics, points_cam: jax.Array, mask: jax.Array,
    width: int, height: int,
):
    """Pinhole projection of camera-frame points.

    Returns (uv [P, 2] int32 pixel coords, valid [P]) — valid requires
    z > 0 and the pixel on-image (`human_tracking.py:235-242`).
    """
    x, y, z = points_cam[..., 0], points_cam[..., 1], points_cam[..., 2]
    z_safe = jnp.where(z > 1e-6, z, 1.0)
    u = intr.fx * x / z_safe + intr.cx
    v = intr.fy * y / z_safe + intr.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    valid = (
        mask
        & (z > 1e-6)
        & (ui >= 0)
        & (ui < width)
        & (vi >= 0)
        & (vi < height)
    )
    uv = jnp.stack([jnp.clip(ui, 0, width - 1), jnp.clip(vi, 0, height - 1)], -1)
    return uv, valid


def points_in_mask(
    seg_mask: jax.Array, uv: jax.Array, valid: jax.Array
) -> jax.Array:
    """Select projected points whose pixel lands inside a segmentation mask
    (`human_tracking.py:250-257`).  seg_mask: [H, W] bool; uv: [P, 2]."""
    hit = seg_mask[uv[..., 1], uv[..., 0]]
    return valid & hit
