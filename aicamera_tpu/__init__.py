"""AICamera-TPU: a TPU-native real-time video detection + tracking engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the AI-Camera
reference (YOLOv8 detection + DeepSORT tracking), designed TPU-first:

- Detection: Flax YOLOv8 (n/s/m) running under ``jax.jit`` in bf16 with a
  fused on-device letterbox/normalize preprocess (Pallas kernel) and
  fixed-shape XLA decode+NMS (replacing the reference's TensorRT engine with
  baked-in NMS, reference ``src/trt_utils/trt_engine.py`` +
  ``src/detector/yolo_detector.py``).
- Tracking: a purely functional DeepSORT core over fixed-capacity padded
  state arrays — vmapped Kalman predict/update, batched cosine/IoU cost
  matrices, Mahalanobis gating and an on-device Hungarian assignment inside
  the matching cascade (replacing the reference's per-object Python loops in
  ``src/tracker/core/*``).
- ReID: a Flax residual embedder over batched on-device crops (replacing
  ``src/tracker/reid_model.py``).
- Scale-out: multi-stream batched tracking via ``jax.vmap`` over a leading
  stream axis, sharded across chips with ``jax.sharding``/``shard_map``.

Public API mirrors the reference surface (``YOLODetector``, ``DeepSORT``,
CLI flags) so users of the reference can switch directly.
"""

__version__ = "0.2.0"  # keep in sync with pyproject.toml

from . import config  # noqa: F401

# Lazy top-level exports (PEP 562): the reference-compatible facades and
# the main runtime entry points, without importing jax/flax at package
# import time (CLI startup and config-only consumers stay light).
_LAZY_EXPORTS = {
    "YOLODetector": "aicamera_tpu.detector",
    "DeepSORT": "aicamera_tpu.tracker_api",
    "ByteTrack": "aicamera_tpu.bytetrack_api",
    "BoTSORT": "aicamera_tpu.botsort_api",
    "StrongSORT": "aicamera_tpu.strongsort_api",
    "OCSort": "aicamera_tpu.ocsort_api",
    "DeepOCSort": "aicamera_tpu.deepocsort_api",
    "ReIDModel": "aicamera_tpu.tracker_api",
    "TrackingPipeline": "aicamera_tpu.runtime.pipeline",
    "MultiStreamPipeline": "aicamera_tpu.parallel",
    "XLAEngine": "aicamera_tpu.runtime.engine",
    "SerializedEngine": "aicamera_tpu.runtime.engine",
    "load_engine": "aicamera_tpu.runtime.engine",
    "export_engine": "aicamera_tpu.runtime.engine",
}

__all__ = ["config", "__version__", *sorted(_LAZY_EXPORTS)]


def __getattr__(name):
    target = _LAZY_EXPORTS.get(name)
    if target is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}")
    import importlib
    return getattr(importlib.import_module(target), name)


def __dir__():
    return sorted(set(globals()) | set(_LAZY_EXPORTS))
