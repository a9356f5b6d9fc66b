"""Perception pipeline: (seg masks + point cloud) -> tracked dynamic obstacles.

The compute-side rebuild of `DetectorNode.synchronized_callback`
(`obstacle_handling/human_tracking.py:179-316`): LiDAR range filter,
lidar->camera transform, pinhole projection, per-instance mask selection,
density clustering for the 3-D center, map-frame transform, then the track
table.  The neural detector itself (YOLO11 seg) stays outside the framework
boundary — this pipeline consumes any detector's instance masks, as arrays
(SURVEY.md 2.3: the rebuild ingests tracked obstacle states as arrays).

Shapes are static: P = max LiDAR points (padded + masked), M = max instances
per frame, all batchable.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import clustering, projection, tracker
from ..obstacles import ObstacleSet

# Reference constants (`obstacle_handling/human_tracking.py`).
MAX_LIDAR_RANGE = 5.0  # `:223-225`
DBSCAN_EPS = 0.08  # `:126`
DBSCAN_MIN_SAMPLES = 10  # `:127`


class FrameGeometry(NamedTuple):
    intrinsics: projection.Intrinsics
    lidar_to_camera: projection.SE3  # hardcoded extrinsic in the reference
    lidar_to_map: projection.SE3  # tf lookup per frame (`:185-188`)
    image_width: int
    image_height: int


def detect_centers(
    geom: FrameGeometry,
    points_lidar: jax.Array,  # [P, 3]
    point_mask: jax.Array,  # [P] bool
    instance_masks: jax.Array,  # [M, H, W] bool segmentation masks
    instance_valid: jax.Array,  # [M] bool
    *,
    eps: float = DBSCAN_EPS,
    min_samples: int = DBSCAN_MIN_SAMPLES,
    max_range: float = MAX_LIDAR_RANGE,
) -> Tuple[jax.Array, jax.Array]:
    """Per-instance 3-D centers in the map frame.

    Returns (centers [M, 2] map-frame x/y, found [M] bool).  Mirrors the
    reference's per-track loop (`human_tracking.py:244-294`) as a vmap over
    instances.
    """
    mask = projection.range_filter(points_lidar, point_mask, max_range)
    points_cam = geom.lidar_to_camera.apply(points_lidar)
    uv, valid = projection.project_points(
        geom.intrinsics, points_cam, mask,
        geom.image_width, geom.image_height,
    )
    points_map = geom.lidar_to_map.apply(points_lidar)

    def per_instance(seg_mask, inst_ok):
        sel = projection.points_in_mask(seg_mask, uv, valid) & inst_ok
        result = clustering.dbscan(
            points_map[:, :2], sel, eps=eps, min_samples=min_samples
        )
        center, found = clustering.largest_cluster_mean(
            points_map[:, :2], result
        )
        return center, found & inst_ok

    centers, found = jax.vmap(per_instance)(instance_masks, instance_valid)
    return centers, found


class PerceptionState(NamedTuple):
    tracks: tracker.TrackTable


def init_perception(capacity: int = 16, dtype=jnp.float32) -> PerceptionState:
    return PerceptionState(tracks=tracker.init_tracks(capacity, dtype))


def step(
    cfg: tracker.TrackerConfig,
    state: PerceptionState,
    geom: FrameGeometry,
    points_lidar: jax.Array,
    point_mask: jax.Array,
    instance_masks: jax.Array,
    instance_valid: jax.Array,
    dt: float,
) -> Tuple[PerceptionState, ObstacleSet]:
    """One synchronized frame -> updated tracks + solver-ready obstacles."""
    centers, found = detect_centers(
        geom, points_lidar, point_mask, instance_masks, instance_valid
    )
    tracks = tracker.update(cfg, state.tracks, centers, found, dt)
    return PerceptionState(tracks=tracks), tracker.to_obstacles(cfg, tracks)
