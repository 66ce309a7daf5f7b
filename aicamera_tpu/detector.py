"""YOLODetector facade: drop-in equivalent of the reference detector API.

Mirrors ``src/detector/yolo_detector.py``: construct with weight path /
input shape / confidence threshold, call ``.detect(frame_bgr)`` and get
``(bboxes_xyxy, scores, class_ids, filtered_indices)`` in original frame
coordinates. Internally the whole detect path (letterbox preprocess →
YOLOv8 → decode → NMS → un-letterbox) is one jitted XLA program per frame
shape, instead of cv2 + TensorRT + host postprocessing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .ops.nms import fused_decode_nms
from .ops.preprocess import letterbox_spec, preprocess_yolo, scale_boxes_back
from .runtime.engine import XLAEngine, enable_persistent_cache
from .runtime.params import resolve_yolo_params


class YOLODetector:
    """TPU YOLOv8 detector with the reference's ``detect`` contract."""

    def __init__(self,
                 engine_path: str | None = None,
                 input_shape: Tuple[int, int] = config.YOLO_INPUT_SHAPE,
                 conf_threshold: float = config.YOLO_CONF_THRESHOLD,
                 nms_threshold: float = config.YOLO_NMS_THRESHOLD,
                 variant: str = "n",
                 device=None):
        enable_persistent_cache()
        self.input_shape = tuple(input_shape)
        self.conf_threshold = float(conf_threshold)
        self.nms_threshold = float(nms_threshold)
        self.device = device or jax.devices()[0]
        self.model, self.params = resolve_yolo_params(
            variant, weights_path=engine_path)
        self._dtype = self.model.dtype
        self.params = jax.device_put(self.params, self.device)
        self._steps = {}
        print(f"YOLODetector initialized (YOLOv8{variant}, XLA on "
              f"{self.device.platform}). Input shape: {self.input_shape}")

    def _get_step(self, frame_hw):
        key = tuple(frame_hw)
        if key in self._steps:
            return self._steps[key]
        spec = letterbox_spec(key, self.input_shape)

        def step(params, frame_u8):
            x = preprocess_yolo(frame_u8, spec, out_dtype=self._dtype)
            levels = self.model.apply(params, x)
            num, nboxes, nscores, nlabels = fused_decode_nms(
                levels,
                score_threshold=config.YOLO_NMS_SCORE_THRESHOLD,
                iou_threshold=self.nms_threshold,
                top_k=config.YOLO_NMS_TOPK,
                max_det=config.YOLO_MAX_DETECTIONS)
            boxes_frame = scale_boxes_back(nboxes[0], spec)
            present = jnp.arange(boxes_frame.shape[0]) < num[0]
            valid = present & (nscores[0] >= self.conf_threshold)
            return boxes_frame, nscores[0], nlabels[0], valid

        # AOT-compile + warm via the engine runtime (TRTEngine analog:
        # deserialize-once + warm-up, trt_engine.py:28-149)
        self._steps[key] = XLAEngine(
            step,
            example_inputs=[self.params,
                            jax.ShapeDtypeStruct((*key, 3), jnp.uint8)],
            name=f"yolov8_detect_{key[0]}x{key[1]}",
            warmup_iters=0)
        return self._steps[key]

    def detect(self, frame_bgr: np.ndarray):
        """Detect objects in one BGR frame.

        Returns (bboxes_xyxy (N,4) f32, scores (N,), class_ids (N,) i32,
        filtered_indices (N,)) — the reference contract
        (yolo_detector.py:68-149). N is the post-threshold count.
        """
        step = self._get_step(frame_bgr.shape[:2])
        boxes, scores, labels, valid = step(self.params, jnp.asarray(frame_bgr))
        valid = np.asarray(valid)
        idx = np.flatnonzero(valid)
        return (np.asarray(boxes)[idx],
                np.asarray(scores)[idx],
                np.asarray(labels)[idx].astype(np.int32),
                idx)

    def warm_up(self, frame_hw, iters: int = 5):
        """Compile + steady-state the detect path for a frame shape
        (parity with TRTEngine._warm_up, trt_engine.py:119-149)."""
        dummy = jnp.zeros((*frame_hw, 3), jnp.uint8)
        step = self._get_step(frame_hw)
        out = None
        for _ in range(iters):
            out = step(self.params, dummy)
        jax.block_until_ready(out)

    def get_engine(self, frame_hw):
        """The underlying XLAEngine (I/O introspection, cost analysis)."""
        return self._get_step(frame_hw)


if __name__ == "__main__":
    # inline smoke test, reference-style (yolo_detector.py:152-197):
    # detect on a random 720p frame and print timing
    import time

    print("--- YOLODetector smoke test ---")
    det = YOLODetector()
    frame = (np.random.RandomState(0).rand(720, 1280, 3) * 255).astype(
        np.uint8)
    det.warm_up(frame.shape[:2], iters=2)
    t0 = time.perf_counter()
    boxes, scores, cls, idx = det.detect(frame)
    dt = time.perf_counter() - t0
    print(f"detect on 720p frame: {dt * 1000:.2f} ms, {len(boxes)} boxes")
    eng = det.get_engine(frame.shape[:2])
    print("engine inputs:", eng.get_input_details()[:2])
    print("engine outputs:", eng.get_output_details())
    assert boxes.shape[1] == 4
    print("--- PASSED ---")
