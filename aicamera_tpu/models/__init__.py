"""Flax model zoo: YOLOv8 detector family and the DeepSORT ReID embedder.

These replace the reference's opaque TensorRT engines
(``models/detection/yolov8n.engine``, ``models/reid/deepsort_reid.engine``,
built by ``scripts/export_trt_engines.sh``) with first-party JAX modules
compiled by XLA. Weights import from the same ONNX files the reference
downloads (``scripts/download_models.sh``) via :mod:`onnx_import`.
"""

from .yolov8 import YOLOv8, YOLOV8_VARIANTS
from .reid import ReIDNet
from .quant import QuantReIDNet, quantize_reid_params

__all__ = ["YOLOv8", "YOLOV8_VARIANTS", "ReIDNet", "QuantReIDNet",
           "quantize_reid_params"]
