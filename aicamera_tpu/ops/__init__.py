"""On-device image ops: letterbox preprocess, decode+NMS, ReID crop gather.

These replace the reference's host-side OpenCV preprocessing
(``src/utils/image_processing.py``) and the NMS baked into its TensorRT
engine with fixed-shape XLA/Pallas computations that live inside the jitted
per-frame step, eliminating the host round-trips that capped the reference
at ~30 FPS end-to-end (SURVEY.md §6).
"""

from .preprocess import (LetterboxSpec, letterbox, letterbox_spec,
                         preprocess_yolo, scale_boxes_back)
from .nms import batched_nms, fused_decode_nms
from .crops import extract_reid_crops
from .gmc import GMCSpec, gmc_spec, estimate_pair, estimate_chunk

__all__ = [
    "LetterboxSpec", "letterbox", "letterbox_spec", "preprocess_yolo", "scale_boxes_back",
    "batched_nms", "fused_decode_nms", "extract_reid_crops",
    "GMCSpec", "gmc_spec", "estimate_pair", "estimate_chunk",
]
