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
from .ops.tiling import (extract_tiles, merge_detections, offset_boxes,
                         tile_layout)
from .runtime.engine import (SerializedEngine, XLAEngine,
                             enable_persistent_cache, export_engine,
                             is_engine_file)
from .runtime.params import resolve_yolo_params


class YOLODetector:
    """TPU YOLOv8 detector with the reference's ``detect`` contract."""

    def __init__(self,
                 engine_path: str | None = None,
                 input_shape: Tuple[int, int] = config.YOLO_INPUT_SHAPE,
                 conf_threshold: float = config.YOLO_CONF_THRESHOLD,
                 nms_threshold: float = config.YOLO_NMS_THRESHOLD,
                 variant: str = "n",
                 device=None,
                 quant: str | None = None,
                 detect_dtype: str | None = None):
        """``detect_dtype``: None/'bf16' (default TPU compute dtype) or
        'f32' — full-precision detect forward. f32 scores are stable
        across batch shapes (batch-1 vs chunk-96 compiles agree instead
        of flipping near-tied NMS orderings at bf16's ~3 significant
        digits) at ~2x forward cost; use for parity-critical runs
        (scripts/clip_parity.py --f32_detect measures both sides)."""
        enable_persistent_cache()
        if quant not in (None, "", "none", "int8"):
            raise ValueError(f"quant must be None or 'int8' (got {quant!r})")
        if detect_dtype not in (None, "bf16", "f32"):
            raise ValueError(
                f"detect_dtype must be None, 'bf16' or 'f32' "
                f"(got {detect_dtype!r})")
        if detect_dtype == "f32" and quant == "int8":
            raise ValueError("detect_dtype='f32' and quant='int8' conflict")
        if quant == "int8" and is_engine_file(engine_path):
            raise ValueError("quant='int8' needs weights, not a serialized "
                             ".xlae engine (calibration happens at load)")
        self.input_shape = tuple(input_shape)
        self.conf_threshold = float(conf_threshold)
        self.nms_threshold = float(nms_threshold)
        self.variant = variant
        self.device = device or jax.devices()[0]
        self._serialized: SerializedEngine | None = None
        self._steps = {}
        if is_engine_file(engine_path):
            # Deserialize a self-contained .xlae artifact: weights,
            # letterbox spec and thresholds are baked in — the exact UX of
            # the reference's `.engine` files (trt_engine.py:45-60).
            self._serialized = SerializedEngine.load(engine_path)
            meta = self._serialized.metadata
            defaults = {"input_shape": tuple(config.YOLO_INPUT_SHAPE),
                        "conf_threshold": float(config.YOLO_CONF_THRESHOLD),
                        "nms_threshold": float(config.YOLO_NMS_THRESHOLD),
                        "variant": "n"}
            for attr, default in defaults.items():
                if attr not in meta:
                    continue
                baked = meta[attr]
                if isinstance(baked, list):
                    baked = tuple(baked)
                given = getattr(self, attr)
                if given != baked and given != default:
                    import warnings
                    warnings.warn(
                        f"{engine_path}: {attr}={baked!r} is baked into "
                        f"the engine; the constructor value {given!r} is "
                        "ignored.", stacklevel=2)
                setattr(self, attr, baked)
            self.model, self.params = None, None
            self._dtype = None
            print(f"YOLODetector initialized from serialized engine "
                  f"'{self._serialized.name}' (XLA on "
                  f"{self.device.platform}). Input shape: {self.input_shape}")
            return
        import jax.numpy as jnp
        _dt = {None: None, "bf16": jnp.bfloat16,
               "f32": jnp.float32}[detect_dtype]
        self.model, self.params = resolve_yolo_params(
            variant, weights_path=engine_path, dtype=_dt)
        if quant == "int8":
            # static-calibrated W8A8 twin (models/quant_yolo.py), same
            # deterministic synthetic calibration as the pipeline's
            from .models.quant_yolo import quantize_yolo_synthetic
            self.model, self.params = quantize_yolo_synthetic(
                self.params, self.model.variant, self.model.num_classes,
                self.input_shape)
        self._dtype = self.model.dtype
        self.params = jax.device_put(self.params, self.device)
        print(f"YOLODetector initialized (YOLOv8{variant}"
              f"{', int8' if quant == 'int8' else ''}, XLA on "
              f"{self.device.platform}). Input shape: {self.input_shape}")

    def _get_step(self, frame_hw):
        key = tuple(frame_hw)
        if key in self._steps:
            return self._steps[key]
        if self._serialized is not None:
            baked_hw = tuple(self._serialized.get_input_details()[0].shape
                             )[:2]
            if key != baked_hw:
                raise ValueError(
                    f"serialized engine '{self._serialized.name}' is built "
                    f"for frame shape {baked_hw}, got {key}. Export an "
                    "engine per frame shape (YOLODetector.export_engine), "
                    "like the reference's fixed-shape TRT engines.")
            eng = self._serialized

            def call(params, frame_u8):  # params baked into the artifact
                return eng(frame_u8)

            self._steps[key] = call
            return call
        spec = letterbox_spec(key, self.input_shape)
        # The NMS pre-filter follows conf_threshold below the default 0.25
        # floor so low-score recipes (e.g. conf_threshold=0.1 feeding
        # ByteTrack's BYTE stage) actually surface those boxes; at the
        # default conf (0.5) this is exactly the reference's 0.25 floor.
        nms_floor = min(config.YOLO_NMS_SCORE_THRESHOLD, self.conf_threshold)

        def step(params, frame_u8):
            x = preprocess_yolo(frame_u8, spec, out_dtype=self._dtype)
            levels = self.model.apply(params, x)
            num, nboxes, nscores, nlabels = fused_decode_nms(
                levels,
                score_threshold=nms_floor,
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

    def _get_tiled_step(self, frame_hw, grid, overlap, include_full,
                        merge_criterion="iou"):
        key = (tuple(frame_hw), grid, overlap, include_full, merge_criterion)
        if key in self._steps:
            return self._steps[key]
        if self._serialized is not None:
            raise ValueError(
                "detect_tiled needs the model + params; this detector was "
                "loaded from a serialized single-pass engine. Construct "
                "from weights instead.")
        origins, tile_hw = tile_layout(frame_hw, grid, overlap)
        tile_spec = letterbox_spec(tile_hw, self.input_shape)
        full_spec = letterbox_spec(tuple(frame_hw), self.input_shape)
        nms_floor = min(config.YOLO_NMS_SCORE_THRESHOLD, self.conf_threshold)
        t = len(origins)
        max_det = config.YOLO_MAX_DETECTIONS

        def step(params, frame_u8):
            tiles = extract_tiles(frame_u8, origins, tile_hw)
            x = jax.vmap(lambda f: preprocess_yolo(
                f, tile_spec, out_dtype=self._dtype)[0])(tiles)
            if include_full:
                xf = preprocess_yolo(frame_u8, full_spec,
                                     out_dtype=self._dtype)
                x = jnp.concatenate([x, xf], axis=0)
            # ONE batched forward for all tiles (+ full frame): a 3x3 4K
            # grid is a batch-10 MXU dispatch, not 10 sequential passes.
            levels = self.model.apply(params, x)
            num, nboxes, nscores, nlabels = fused_decode_nms(
                levels,
                score_threshold=nms_floor,
                iou_threshold=self.nms_threshold,
                top_k=config.YOLO_NMS_TOPK,
                max_det=max_det)
            tb = jax.vmap(lambda b: scale_boxes_back(b, tile_spec))(
                nboxes[:t])
            tb = jnp.stack([offset_boxes(tb[i], y0, x0)
                            for i, (y0, x0) in enumerate(origins)])
            slot = jnp.arange(max_det)
            parts = [(tb.reshape(-1, 4), nscores[:t].reshape(-1),
                      nlabels[:t].reshape(-1),
                      (slot[None, :] < num[:t, None]).reshape(-1))]
            if include_full:
                parts.append((scale_boxes_back(nboxes[t], full_spec),
                              nscores[t], nlabels[t], slot < num[t]))
            allb, alls, allc, allv = (jnp.concatenate(p)
                                      for p in zip(*parts))
            num_m, mb, ms, mc = merge_detections(
                allb, alls, allc, allv, self.nms_threshold, max_det,
                frame_hw=tuple(frame_hw), criterion=merge_criterion)
            present = jnp.arange(mb.shape[0]) < num_m
            return mb, ms, mc, present & (ms >= self.conf_threshold)

        self._steps[key] = XLAEngine(
            step,
            example_inputs=[self.params,
                            jax.ShapeDtypeStruct((*frame_hw, 3), jnp.uint8)],
            name=(f"yolov8_detect_tiled_{frame_hw[0]}x{frame_hw[1]}"
                  f"_{grid[0]}x{grid[1]}_{merge_criterion}"),
            warmup_iters=0)
        return self._steps[key]

    def detect_tiled(self, frame_bgr: np.ndarray,
                     grid: Tuple[int, int] = (2, 2), overlap: float = 0.2,
                     include_full_frame: bool = True,
                     merge_criterion: str = "iou"):
        """Sliced high-resolution detection (SAHI-style), same return
        contract as :meth:`detect`.

        Slices the frame into a static ``grid`` of tiles with fractional
        ``overlap``, detects on all tiles (plus the full frame when
        ``include_full_frame``, so large objects that span tiles are still
        seen whole) in ONE batched forward, and merges everything with a
        global on-device NMS (``ops/tiling.py``). Small objects that the
        full-frame letterbox shrinks below detectability are seen by their
        tile at near-native scale. The reference has no equivalent — it
        always letterboxes the full frame (``yolo_detector.py:86-94``).

        ``merge_criterion="ios"`` switches the merge NMS to
        intersection-over-smaller-area (SAHI's choice), which collapses
        tile-boundary fragments against the full-frame detection of the
        same object; "iou" (default) matches the in-model NMS semantics.
        """
        step = self._get_tiled_step(frame_bgr.shape[:2], tuple(grid),
                                    float(overlap), bool(include_full_frame),
                                    str(merge_criterion))
        boxes, scores, labels, valid = step(self.params,
                                            jnp.asarray(frame_bgr))
        valid = np.asarray(valid)
        idx = np.flatnonzero(valid)
        return (np.asarray(boxes)[idx],
                np.asarray(scores)[idx],
                np.asarray(labels)[idx].astype(np.int32),
                idx)

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
        """The underlying engine (I/O introspection, cost analysis)."""
        if self._serialized is not None:
            self._get_step(frame_hw)  # shape validation
            return self._serialized
        return self._get_step(frame_hw)

    def export_engine(self, frame_hw, path, name: str | None = None):
        """Serialize the fused detect step for ``frame_hw`` to a
        self-contained ``.xlae`` artifact (weights + letterbox spec +
        thresholds baked in) — the analog of the reference's trtexec build
        (scripts/export_trt_engines.sh): a YOLODetector constructed with
        ``engine_path=<artifact>`` runs with no weight files or model code
        resolution.
        """
        if self._serialized is not None:
            raise ValueError("this detector was itself loaded from a "
                             "serialized engine; nothing new to export")
        key = tuple(frame_hw)
        spec = letterbox_spec(key, self.input_shape)
        model, dtype = self.model, self._dtype
        conf_t, nms_t = self.conf_threshold, self.nms_threshold
        params = self.params

        nms_floor = min(config.YOLO_NMS_SCORE_THRESHOLD, conf_t)

        def step(frame_u8):
            x = preprocess_yolo(frame_u8, spec, out_dtype=dtype)
            levels = model.apply(params, x)
            num, nboxes, nscores, nlabels = fused_decode_nms(
                levels,
                score_threshold=nms_floor,
                iou_threshold=nms_t,
                top_k=config.YOLO_NMS_TOPK,
                max_det=config.YOLO_MAX_DETECTIONS)
            boxes_frame = scale_boxes_back(nboxes[0], spec)
            present = jnp.arange(boxes_frame.shape[0]) < num[0]
            valid = present & (nscores[0] >= conf_t)
            return boxes_frame, nscores[0], nlabels[0], valid

        return export_engine(
            step,
            example_inputs=[jax.ShapeDtypeStruct((*key, 3), jnp.uint8)],
            path=path,
            name=name or f"yolov8{self.variant}_detect_{key[0]}x{key[1]}",
            metadata={"frame_hw": list(key),
                      "input_shape": list(self.input_shape),
                      "conf_threshold": self.conf_threshold,
                      "nms_threshold": self.nms_threshold,
                      "variant": self.variant})


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
