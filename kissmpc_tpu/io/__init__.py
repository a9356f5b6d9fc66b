from .model import Model
from .pubsub import ControlLoop, LatestValue, RateTimer
from .transforms import (
    SE2,
    decimate_plan,
    plan_changed,
    quaternion_from_yaw,
    yaw_from_quaternion,
)

__all__ = [
    "Model",
    "ControlLoop",
    "LatestValue",
    "RateTimer",
    "SE2",
    "decimate_plan",
    "plan_changed",
    "quaternion_from_yaw",
    "yaw_from_quaternion",
]
