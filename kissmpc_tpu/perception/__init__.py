from . import clustering, pipeline, projection, tracker
from .clustering import ClusterResult, dbscan, largest_cluster_mean
from .pipeline import (
    FrameGeometry,
    PerceptionState,
    detect_centers,
    init_perception,
)
from .projection import SE3, Intrinsics
from .tracker import TrackerConfig, TrackTable, init_tracks, to_obstacles

__all__ = [
    "clustering",
    "pipeline",
    "projection",
    "tracker",
    "ClusterResult",
    "dbscan",
    "largest_cluster_mean",
    "FrameGeometry",
    "PerceptionState",
    "detect_centers",
    "init_perception",
    "SE3",
    "Intrinsics",
    "TrackerConfig",
    "TrackTable",
    "init_tracks",
    "to_obstacles",
]
