"""Central configuration: model paths, thresholds, classes, capacities.

Capability parity with reference ``src/config.py`` (paths, YOLO/DeepSORT
hyper-parameters, COCO classes, tracked-class set, colors, fonts, output
FPS), plus the TPU-specific static capacities (padded track/detection/crop
counts) that replace the reference's dynamic Python lists so everything
compiles to fixed shapes under ``jax.jit``.
"""

from __future__ import annotations

import random
from pathlib import Path

# --- Project root ----------------------------------------------------------
PROJECT_ROOT = Path(__file__).resolve().parent.parent

# --- Model configuration ---------------------------------------------------
# Weight files (ONNX, converted on first use; reference used TensorRT
# engines built from the same ONNX files — src/config.py:12-13).
YOLO_ONNX_PATH = PROJECT_ROOT / "models/detection/yolov8n.onnx"
REID_ONNX_PATH = PROJECT_ROOT / "models/reid/deepsort_reid.onnx"
# Converted/JAX-native checkpoints (msgpack of Flax params).
YOLO_PARAMS_PATH = PROJECT_ROOT / "models/detection/yolov8n.msgpack"
REID_PARAMS_PATH = PROJECT_ROOT / "models/reid/deepsort_reid.msgpack"

# YOLOv8 (reference src/config.py:16-18)
YOLO_INPUT_SHAPE = (640, 640)  # (H, W)
YOLO_CONF_THRESHOLD = 0.3
YOLO_NMS_THRESHOLD = 0.5  # consumed by our on-device NMS (dead in reference)
YOLO_NMS_SCORE_THRESHOLD = 0.25  # pre-NMS score floor (TRT engine analog)
YOLO_MAX_DETECTIONS = 100  # post-NMS cap, matches the TRT engine contract
YOLO_NMS_TOPK = 300  # pre-NMS candidate pool

# DeepSORT (reference src/config.py:23-29; values from original deep_sort.yaml)
DEEPSORT_MAX_DIST = 0.2
DEEPSORT_MIN_CONFIDENCE = 0.3
DEEPSORT_NMS_MAX_OVERLAP = 1.0  # kept for config parity (unused, as in ref)
DEEPSORT_MAX_IOU_DISTANCE = 0.7
DEEPSORT_MAX_AGE = 70
DEEPSORT_N_INIT = 3
DEEPSORT_NN_BUDGET = 100

# ReID model (reference src/config.py:32)
REID_INPUT_SHAPE = (128, 64)  # (H, W)
REID_FEATURE_DIM = 512

# --- TPU static capacities --------------------------------------------------
# Fixed shapes so the whole tracker step is one compiled XLA program.
MAX_TRACKS = 128        # padded track-slot capacity (bump to 256 for crowds)
MAX_DETECTIONS = 64     # padded per-frame detection capacity fed to tracker
MAX_REID_CROPS = 32     # padded per-frame ReID crop batch

# --- Class configuration (COCO, YOLOv8 ordering) ----------------------------
CLASSES = (
    'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus', 'train',
    'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
    'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse', 'sheep', 'cow',
    'elephant', 'bear', 'zebra', 'giraffe', 'backpack', 'umbrella',
    'handbag', 'tie', 'suitcase', 'frisbee', 'skis', 'snowboard',
    'sports ball', 'kite', 'baseball bat', 'baseball glove', 'skateboard',
    'surfboard', 'tennis racket', 'bottle', 'wine glass', 'cup', 'fork',
    'knife', 'spoon', 'bowl', 'banana', 'apple', 'sandwich', 'orange',
    'broccoli', 'carrot', 'hot dog', 'pizza', 'donut', 'cake', 'chair',
    'couch', 'potted plant', 'bed', 'dining table', 'toilet', 'tv',
    'laptop', 'mouse', 'remote', 'keyboard', 'cell phone', 'microwave',
    'oven', 'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase',
    'scissors', 'teddy bear', 'hair drier', 'toothbrush',
)

# Classes eligible for tracking (reference src/config.py:53 — note the
# reference README claims person-only but the code tracks these 5 classes).
CLASSES_TO_TRACK = {'person', 'car', 'bus', 'truck', 'motorcycle'}
CLASS_IDS_TO_TRACK = tuple(
    i for i, name in enumerate(CLASSES) if name in CLASSES_TO_TRACK
)

# --- Visualization ----------------------------------------------------------
_color_rng = random.Random(0)
CLASS_COLORS = {
    cls_name: [_color_rng.randint(0, 255) for _ in range(3)]
    for cls_name in CLASSES
}
DEFAULT_TRACK_COLOR = (0, 255, 0)

FONT_SCALE_ID = 0.7
FONT_SCALE_INFO = 0.9
FONT_THICKNESS = 2

# --- Video I/O ---------------------------------------------------------------
DEFAULT_OUTPUT_FPS = 30

# --- Compute policy ----------------------------------------------------------
# bf16 matmuls/convs on the MXU, f32 accumulation; tracker core stays f32.
COMPUTE_DTYPE = "bfloat16"


def get_track_color(class_name: str):
    """Color for a tracked box of the given class."""
    return CLASS_COLORS.get(class_name, DEFAULT_TRACK_COLOR)


def get_class_color(class_name: str):
    """Color for a raw detection box of the given class."""
    return CLASS_COLORS.get(class_name, (200, 200, 200))
