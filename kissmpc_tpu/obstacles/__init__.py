from .obstacles import (
    HUMAN_RADIUS,
    PREDICTION_DT,
    ObstacleSet,
    concatenate,
    distance_to_point,
    dynamic_set,
    empty,
    predict_tracks,
    select_nearest,
    static_set,
)

__all__ = [
    "HUMAN_RADIUS",
    "PREDICTION_DT",
    "ObstacleSet",
    "concatenate",
    "distance_to_point",
    "dynamic_set",
    "empty",
    "predict_tracks",
    "select_nearest",
    "static_set",
]
