"""Model parameter resolution: checkpoint -> ONNX import -> seeded init.

The reference acquires ONNX weights with ``scripts/download_models.sh`` and
AOT-compiles them to TensorRT engines. Here the resolution order is:

1. a converted Flax checkpoint (``models/**/*.msgpack``) if present;
2. the same ONNX file the reference uses, imported by
   :mod:`aicamera_tpu.models.onnx_import` (pure-python protobuf parsing,
   no onnx dependency) and cached back as msgpack;
3. deterministic random initialization (PRNG seed 0) with a loud warning —
   keeps the whole pipeline runnable for benchmarks and tests in
   environments without the weight files (the analog of the reference's
   CPU mock mode, ``reid_model.py:51-64``).
"""

from __future__ import annotations

import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
from flax import serialization

from .. import config
from ..models import ReIDNet, YOLOv8


def compute_dtype():
    """bf16 on TPU (MXU-native); f32 elsewhere (bf16 is emulated on CPU)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def template_params(model, example_input):
    """Build a parameter pytree WITHOUT running the model.

    ``model.init`` would compile and execute every conv (minutes on the CPU
    backend); ``jax.eval_shape`` gives the exact same tree structure in
    milliseconds. Leaves are filled with a deterministic fan-in-scaled
    normal (seed 0) so the untrained pipeline still produces finite, stable
    activations — the analog of the reference ReID model's deterministic
    CPU mock mode (reid_model.py:51-64), but for every model.
    """
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), example_input)
    leaves, treedef = jax.tree.flatten(shapes)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, len(leaves))

    def materialize(k, s):
        if s.ndim <= 1:  # biases / scales
            return jnp.zeros(s.shape, s.dtype)
        fan_in = 1
        for d in s.shape[:-1]:
            fan_in *= d
        scale = (1.0 / fan_in) ** 0.5
        return (jax.random.normal(k, s.shape, jnp.float32) * scale
                ).astype(s.dtype)

    return jax.tree.unflatten(
        treedef, [materialize(k, s) for k, s in zip(keys, leaves)])


def _load_msgpack(path: Path, template):
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    # Commit the leaves to the device ONCE. from_bytes returns host numpy
    # arrays; passing those to a jitted function re-uploads every leaf on
    # EVERY dispatch (measured: +250 ms/chunk for the 12.6 MB YOLOv8n tree
    # on the tunneled runtime — scripts/profile_synthetic_load.py).
    return jax.tree.map(jnp.asarray, restored)


def _save_msgpack(path: Path, params) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def _validate_explicit(path: Path) -> None:
    """An explicitly requested weights file must resolve to itself.

    The silent fallbacks below are right for the *default* resolution
    chain (missing default weights -> seeded random init is the documented
    no-weights benchmark mode), but dangerous for an explicit path: a
    typo'd ``--yolo_weights``, a missing ``--eval_only`` checkpoint, or a
    serialized ``.xlae`` engine passed where raw weights are needed would
    otherwise silently run with DIFFERENT (random or default) parameters.
    The reference aborts on a bad engine path (aicamera_tracker.py:94-97);
    so do we.
    """
    from .engine import is_engine_file

    if is_engine_file(path):
        raise ValueError(
            f"{path} is a serialized engine artifact (.xlae): it bakes "
            "weights + preprocess into a fixed batch-1 program and cannot "
            "initialize a weight-based pipeline. Load it with "
            "YOLODetector(engine_path=...) / ReIDModel(engine_path=...), "
            "or pass the .msgpack/.onnx weights file here instead.")
    if path.suffix not in (".msgpack", ".onnx"):
        raise ValueError(
            f"unsupported weights file {path}: expected a .msgpack Flax "
            "checkpoint or a .onnx export")
    if not path.exists():
        raise FileNotFoundError(
            f"weights file not found: {path} (an explicit path does not "
            "fall back to random init; omit it for default resolution)")


def resolve_yolo_params(variant: str = "n", num_classes: int = 80,
                        weights_path: str | None = None,
                        dtype=None):
    """Return (model, params) for the YOLOv8 detector.

    ``dtype`` overrides the compute dtype (default: bf16 on TPU). Params
    are stored f32 either way — f32 compute ("detect_dtype='f32'" on the
    detector/pipeline surfaces) trades ~2x MXU/HBM cost in the forward
    for batch-shape-stable scores: bf16 activations quantize to ~3
    significant digits, so near-tied NMS candidate scores flip order
    between batch-1 and chunk-batch compiles (the production-pipeline /
    facade divergence measured in docs/CLIP_PARITY_ADAPTED.md)."""
    model = YOLOv8(variant=variant, num_classes=num_classes,
                   dtype=dtype if dtype is not None else compute_dtype())
    template = template_params(
        model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    if weights_path:
        _validate_explicit(Path(weights_path))
    path = Path(weights_path) if weights_path else config.YOLO_PARAMS_PATH
    if path.suffix == ".msgpack" and path.exists():
        return model, _load_msgpack(path, template)
    onnx_path = path if path.suffix == ".onnx" else config.YOLO_ONNX_PATH
    if onnx_path.exists():
        from ..models.onnx_import import import_yolo_params
        params = import_yolo_params(
            onnx_path, template, model=model,
            example_input=jnp.zeros((1, 64, 64, 3), jnp.float32))
        if weights_path is None:
            # cache the conversion only for the default weights location —
            # an explicit path (tests, experiments) must not overwrite the
            # global cache
            cache = config.YOLO_PARAMS_PATH if variant == "n" else \
                config.YOLO_PARAMS_PATH.with_name(f"yolov8{variant}.msgpack")
            _save_msgpack(cache, params)
        return model, params
    warnings.warn(
        f"No YOLOv8{variant} weights found at {path} / {onnx_path}; "
        "using seeded random init (detections will be meaningless). "
        "Run scripts/download_models.sh to fetch the ONNX weights.")
    return model, template


def resolve_reid_params(weights_path: str | None = None, dtype=None):
    """Return (model, params) for the ReID embedder. ``dtype`` overrides
    the compute dtype (see :func:`resolve_yolo_params` — same
    batch-shape-stability rationale for the embed stage, whose batch
    shape differs between the facade's fixed per-frame bucket and the
    pipeline's chunk-fused load-adaptive buckets)."""
    model = ReIDNet(feature_dim=config.REID_FEATURE_DIM,
                    dtype=dtype if dtype is not None else compute_dtype())
    template = template_params(
        model, jnp.zeros((1, *config.REID_INPUT_SHAPE, 3), jnp.float32))
    if weights_path:
        _validate_explicit(Path(weights_path))
    path = Path(weights_path) if weights_path else config.REID_PARAMS_PATH
    if path.suffix == ".msgpack" and path.exists():
        return model, _load_msgpack(path, template)
    onnx_path = path if path.suffix == ".onnx" else config.REID_ONNX_PATH
    if onnx_path.exists():
        from ..models.onnx_import import import_reid_params
        params = import_reid_params(
            onnx_path, template, model=model,
            example_input=jnp.zeros((1, *config.REID_INPUT_SHAPE, 3),
                                    jnp.float32))
        if weights_path is None:
            _save_msgpack(config.REID_PARAMS_PATH, params)
        return model, params
    warnings.warn(
        f"No ReID weights found at {path} / {onnx_path}; using seeded "
        "random init (appearance features untrained but deterministic).")
    return model, template
