"""Pure-JAX DeepSORT tracker core (hardware-free, fully jit/vmap-able).

This package replaces the reference's object-oriented, per-track Python core
(``src/tracker/core/*``) with a functional design over fixed-capacity padded
arrays: a :class:`~aicamera_tpu.core.state.TrackerState` pytree holds all
track slots, and every step (Kalman predict/update, cost matrices,
Mahalanobis gating, Hungarian assignment, matching cascade, lifecycle
transitions) is a masked batched array op so a whole tracking step compiles
to one XLA program.
"""

from .state import TrackerState, Detections, TrackerParams, init_state, make_detections
from .tracker import predict, update
from . import kalman, costs, assignment, bytetrack

__all__ = [
    "TrackerState", "Detections", "TrackerParams",
    "init_state", "make_detections",
    "predict", "update",
    "kalman", "costs", "assignment", "bytetrack",
]
