"""DeepSORT and ReIDModel facades: the reference tracker API, TPU inside.

``DeepSORT.update(bboxes, confs, class_ids, frame)`` keeps the exact
call/return contract of the reference (``src/tracker/deepsort_tracker.py``:
list of ``(x1, y1, x2, y2, track_id, class_name, conf)`` for confirmed,
just-updated tracks), but internally pads the detections to static shapes
and runs crop-gather + ReID + association + lifecycle as one jitted XLA
step on the TPU.

``ReIDModel`` mirrors ``src/tracker/reid_model.py``: batched feature
extraction from host crop lists, with padded bucket shapes to bound
recompiles (the reference's engine had dynamic batch 1..8; we bucket to
powers of two).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .core import state as core_state
from .core import tracker as core_tracker
from .core.state import Detections, TrackerParams
from .ops.crops import extract_reid_crops
from .runtime.engine import (SerializedEngine, enable_persistent_cache,
                             export_engine, is_engine_file)
from .runtime.params import resolve_reid_params


class ReIDModel:
    """Appearance feature extractor with the reference's host-crop API."""

    _BUCKETS = (1, 2, 4, 8, 16, 32, 64)

    def __init__(self,
                 engine_path: str | None = None,
                 input_shape: Tuple[int, int] = config.REID_INPUT_SHAPE,
                 device=None,
                 quant: str | None = None,
                 reid_dtype: str | None = None):
        """``reid_dtype='f32'``: full-precision embed forward — features
        become stable across embed batch shapes (see
        TrackingPipeline(reid_dtype=...)); default is the backend compute
        dtype (bf16 on TPU)."""
        enable_persistent_cache()
        self.input_shape = tuple(input_shape)
        self.device = device or jax.devices()[0]
        self._serialized: SerializedEngine | None = None
        if quant not in (None, "", "none", "int8"):
            raise ValueError(f"quant must be None or 'int8' (got {quant!r})")
        if reid_dtype not in (None, "bf16", "f32"):
            raise ValueError(f"reid_dtype must be None, 'bf16' or 'f32' "
                             f"(got {reid_dtype!r})")
        if reid_dtype == "f32" and quant == "int8":
            raise ValueError("reid_dtype='f32' and quant='int8' conflict")
        self._reid_dtype = reid_dtype
        if quant == "int8" and is_engine_file(engine_path):
            raise ValueError("quant='int8' needs weights, not a serialized "
                             ".xlae engine (quantization happens at load)")
        if is_engine_file(engine_path):
            # Self-contained .xlae artifact: weights baked in; a symbolic
            # batch axis gives the dynamic batch 1..N of the reference's
            # TRT ReID engine (export_trt_engines.sh:32-34).
            self._serialized = SerializedEngine.load(engine_path)
            out = self._serialized.get_output_details()[0]
            self.feature_dim = int(out.shape[-1])
            in_shape = self._serialized.get_input_details()[0].shape
            self.input_shape = (int(in_shape[1]), int(in_shape[2]))
            self.model, self.params = None, None
            eng = self._serialized
            self._apply = lambda params, x: eng(x.astype(jnp.float32))
        else:
            _dt = {None: None, "bf16": jnp.bfloat16,
                   "f32": jnp.float32}[reid_dtype]
            self.model, self.params = resolve_reid_params(engine_path,
                                                          dtype=_dt)
            self.feature_dim = config.REID_FEATURE_DIM
            if quant == "int8":
                # W8A8 post-training quantization (models/quant.py): the
                # TPU-native notch past the reference's --fp16 engines.
                from .models.quant import QuantReIDNet, quantize_reid_params
                self.model = QuantReIDNet(
                    feature_dim=config.REID_FEATURE_DIM)
                self.params = quantize_reid_params(self.params)
            self._apply = jax.jit(self.model.apply)

    def _preprocess(self, crop_bgr: np.ndarray) -> np.ndarray:
        """Host-side resize+normalize for the list API (parity with
        image_processing.preprocess_reid_input :105-138)."""
        import cv2
        h, w = self.input_shape
        resized = cv2.resize(crop_bgr, (w, h), interpolation=cv2.INTER_LINEAR)
        rgb = resized[..., ::-1].astype(np.float32) / 255.0
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return (rgb - mean) / std  # HWC (TPU-native layout)

    def device_apply(self, params, crops):
        """Traceable embed for fused device steps: ``(B, H, W, 3)``
        normalized crops -> ``(B, feature_dim)``. Composable inside a
        larger jitted program (the exported StableHLO call is traceable
        when this model wraps a serialized engine)."""
        if self._serialized is not None:
            return self._serialized.exported.call(
                crops.astype(jnp.float32))
        return self.model.apply(params, crops)

    def export_engine(self, path, name: str = "reid_embed",
                      dynamic_batch: bool = True, batch: int = 8):
        """Serialize the embedder (weights baked in) to a ``.xlae``
        artifact. ``dynamic_batch=True`` exports a symbolic batch axis —
        the analog of the reference ReID engine's dynamic batch profile
        (min 1 / max 8, export_trt_engines.sh:32-34) without its max-8
        ceiling; each concrete batch compiles once on first use.

        The artifact's input contract is normalized float32 NHWC crops
        (ImageNet mean/std, RGB), the tensor both host
        (:meth:`extract_features_batched`) and device
        (:meth:`device_apply`) call sites already produce.
        """
        if self._serialized is not None:
            raise ValueError("this ReIDModel was itself loaded from a "
                             "serialized engine; nothing new to export")
        model, params = self.model, self.params
        mdtype = model.dtype

        def embed(crops_f32):
            feats = model.apply(params, crops_f32.astype(mdtype))
            return feats.astype(jnp.float32)

        if dynamic_batch:
            from jax import export as jax_export
            (b,) = jax_export.symbolic_shape("b")
            spec = jax.ShapeDtypeStruct((b, *self.input_shape, 3),
                                        jnp.float32)
        else:
            spec = jax.ShapeDtypeStruct((batch, *self.input_shape, 3),
                                        jnp.float32)
        return export_engine(
            embed, example_inputs=[spec], path=path, name=name,
            metadata={"input_shape": list(self.input_shape),
                      "feature_dim": self.feature_dim,
                      "dynamic_batch": bool(dynamic_batch)})

    def extract_features_batched(self, crops_bgr: List[np.ndarray]) -> np.ndarray:
        """(N crops) -> (N, feature_dim) float32, L2-normalized.

        Invalid (empty) crops contribute zero feature rows, matching the
        reference's behavior of skipping them (reid_model.py:84-94).
        """
        if not crops_bgr:
            return np.zeros((0, self.feature_dim), np.float32)
        valid_idx = [i for i, c in enumerate(crops_bgr)
                     if c is not None and c.size > 0
                     and c.shape[0] > 0 and c.shape[1] > 0]
        out = np.zeros((len(crops_bgr), self.feature_dim), np.float32)
        if not valid_idx:
            return out
        batch = np.stack([self._preprocess(crops_bgr[i]) for i in valid_idx])
        n = len(valid_idx)
        bucket = next(b for b in self._BUCKETS if b >= n) if n <= 64 else n
        padded = np.zeros((bucket, *batch.shape[1:]), np.float32)
        padded[:n] = batch
        feats = np.asarray(self._apply(self.params, jnp.asarray(padded)))
        out[valid_idx] = feats[:n]
        return out


class DeepSORT:
    """High-level tracker facade (reference deepsort_tracker.py:15-141)."""

    def __init__(self,
                 reid_model_path: str | None = None,
                 reid_input_shape: Tuple[int, int] = config.REID_INPUT_SHAPE,
                 max_cosine_distance: float = config.DEEPSORT_MAX_DIST,
                 nn_budget: Optional[int] = config.DEEPSORT_NN_BUDGET,
                 max_iou_distance: float = config.DEEPSORT_MAX_IOU_DISTANCE,
                 max_age: int = config.DEEPSORT_MAX_AGE,
                 n_init: int = config.DEEPSORT_N_INIT,
                 min_detection_confidence: float = config.DEEPSORT_MIN_CONFIDENCE,
                 max_tracks: int = config.MAX_TRACKS,
                 max_detections: int = config.MAX_DETECTIONS,
                 max_reid_crops: int = config.MAX_REID_CROPS,
                 capture_features: bool = False,
                 gallery_strategy: str = "fifo",
                 ema_alpha: float = 0.9,
                 gmc: str | bool = False,
                 nsa: bool = False,
                 reid_quant: str | None = None,
                 reid_dtype: str | None = None):
        """Deviation from the reference: ``nn_budget=None`` means an
        unlimited feature gallery there (tracker_core.py:20), but the
        fixed-shape device state needs a static ring size, so ``None`` is
        mapped to a 100-entry ring (the reference's configured default,
        config.py:29) with a warning. Pass an explicit budget to silence
        it.

        ``capture_features=True`` makes each :meth:`update` stash host
        copies of the step's post-filter inputs and on-device appearance
        features (``last_tlwh/last_conf/last_class_id/last_features/
        last_has_feature``, all length ``len(keep)``), so an external
        oracle (e.g. the reference's TrackerCore) can be driven with
        bit-identical detections — used by scripts/clip_parity.py.

        ``gallery_strategy`` selects appearance-memory management:
        ``"fifo"`` (default) is the reference's ring of up to
        ``nn_budget`` raw features per track (track.py:70-74);
        ``"ema"`` keeps one StrongSORT-style exponential-moving-average
        embedding per track (blend factor ``ema_alpha``), the "smarter
        gallery management" enhancement from the reference's README
        future-work list — cheaper (gallery shrinks to one slot) and
        more drift-robust on long occlusions.

        ``gmc`` (``"affine"``/``True`` or ``"translation"``): camera-
        motion compensation (:mod:`.ops.gmc`) — the per-frame camera
        affine warps the Kalman bank between predict and association
        (BoT-SORT ordering). DeepSORT + EMA gallery + GMC together are
        the full StrongSORT/BoT-SORT-style upgrade stack.

        ``nsa=True`` enables StrongSORT's noise-scale-adaptive Kalman
        update: each matched correction scales its measurement noise by
        ``(1 - detection_confidence)``, trusting confident detections
        more (see :func:`core.kalman.project`)."""
        enable_persistent_cache()
        self._gmc = None
        if gmc not in (False, None, "off", "none", ""):
            from .ops.gmc import GMCEstimator
            self._gmc = GMCEstimator("affine" if gmc is True else str(gmc))
        if gallery_strategy not in ("fifo", "ema"):
            raise ValueError(
                f"gallery_strategy must be 'fifo' or 'ema' "
                f"(got {gallery_strategy!r})")
        use_ema = gallery_strategy == "ema"
        if use_ema and not (0.0 < ema_alpha < 1.0):
            raise ValueError(
                f"ema_alpha must be in (0, 1) for the EMA gallery "
                f"(got {ema_alpha})")
        if nn_budget is None:
            import warnings
            warnings.warn(
                "nn_budget=None (unlimited gallery in the reference) is "
                "not representable in fixed device shapes; using a "
                "100-entry feature ring instead. Pass nn_budget explicitly "
                "to choose the ring size.", stacklevel=2)
        self.params = TrackerParams(
            max_cosine_distance=max_cosine_distance,
            # The EMA bank only ever occupies gallery slot 0 — shrink the
            # (T, G, D) gallery tensor to one slot.
            nn_budget=1 if use_ema else (nn_budget or 100),
            max_iou_distance=max_iou_distance,
            max_age=max_age,
            n_init=n_init,
            max_tracks=max_tracks,
            max_detections=max_detections,
            feature_dim=config.REID_FEATURE_DIM,
            ema_alpha=float(ema_alpha) if use_ema else 0.0,
            nsa=bool(nsa),
        )
        self.min_detection_confidence = float(min_detection_confidence)
        self.max_reid_crops = int(max_reid_crops)
        self._capture = bool(capture_features)
        self.reid_model = ReIDModel(engine_path=reid_model_path,
                                    input_shape=reid_input_shape,
                                    quant=reid_quant,
                                    reid_dtype=reid_dtype)
        self.state = core_state.init_state(self.params)
        self.frame_count = 0
        self._steps = {}
        self._dropped_host = 0
        self._warned_capacity = False
        print("DeepSORT Tracker initialized (TPU/XLA).")
        print(f"  TrackerCore Params: CosDist={max_cosine_distance}, "
              f"IoUDist={max_iou_distance}, MaxAge={max_age}, NInit={n_init}, "
              f"NNBudget={nn_budget}, Gallery={gallery_strategy}"
              + (f"(alpha={ema_alpha})" if use_ema else ""))

    def reset(self):
        self.state = core_state.init_state(self.params)
        self.frame_count = 0
        self._dropped_host = 0
        if self._gmc is not None:
            self._gmc.reset()

    @property
    def dropped_detections(self) -> int:
        """Total detections dropped to the fixed max_detections capacity
        (host truncation + on-device make_detections counter). The
        reference has no capacity and processes every detection; a nonzero
        value flags crowded-scene divergence."""
        return self._dropped_host + int(np.asarray(self.state.dropped))

    def get_active_tracks(self):
        """All live tracks (confirmed AND tentative, matched or not) as
        (x1, y1, x2, y2, track_id, class_name, conf, time_since_update)
        tuples — parity with TrackerCore.get_active_tracks
        (tracker_core.py:196-198) with tsu exposed for filtering."""
        from .core.costs import mean_to_tlwh, tlwh_to_tlbr
        import jax.numpy as jnp
        st = self.state
        tlbr = np.asarray(tlwh_to_tlbr(mean_to_tlwh(jnp.asarray(st.mean))))
        active = np.asarray(st.active)
        out = []
        for i in np.flatnonzero(active):
            cid = int(np.asarray(st.class_id)[i])
            name = config.CLASSES[cid] if 0 <= cid < len(config.CLASSES) \
                else "Unknown"
            b = tlbr[i]
            out.append((int(round(float(b[0]))), int(round(float(b[1]))),
                        int(round(float(b[2]))), int(round(float(b[3]))),
                        int(np.asarray(st.track_id)[i]), name,
                        float(np.asarray(st.conf)[i]),
                        int(np.asarray(st.tsu)[i])))
        return out

    def _get_step(self, frame_hw):
        key = tuple(frame_hw)
        if key in self._steps:
            return self._steps[key]
        p = self.params
        n_det = p.max_detections
        n_crops = self.max_reid_crops
        reid_apply = self.reid_model.device_apply

        use_gmc = self._gmc is not None

        def step(reid_params, state, frame_u8, d_xyxy, d_conf, d_cls,
                 d_valid, gmc=None):
            crops, crop_valid = extract_reid_crops(
                frame_u8, d_xyxy[:n_crops],
                out_hw=self.reid_model.input_shape)
            feats = reid_apply(reid_params, crops)
            d_feats = jnp.zeros((n_det, p.feature_dim), jnp.float32)
            d_feats = d_feats.at[:n_crops].set(feats.astype(jnp.float32))
            d_hasfeat = jnp.zeros((n_det,), jnp.bool_).at[:n_crops].set(
                crop_valid & d_valid[:n_crops])
            tlwh = jnp.concatenate(
                [d_xyxy[:, :2], d_xyxy[:, 2:] - d_xyxy[:, :2]], axis=-1)
            dets = Detections(tlwh=tlwh, conf=d_conf, class_id=d_cls,
                              feature=d_feats, has_feature=d_hasfeat,
                              valid=d_valid)
            state = core_tracker.predict(state, p)
            if use_gmc:
                from .ops.gmc import warp_xyah_bank
                m, c = warp_xyah_bank(state.mean, state.cov, gmc[0],
                                      gmc[1], state.active)
                state = state.replace(mean=m, cov=c)
            state = core_tracker.update(state, dets, p)
            outs = core_tracker.get_outputs(state)
            if self._capture:
                return state, (outs, d_feats, d_hasfeat)
            return state, outs

        self._steps[key] = jax.jit(step, donate_argnums=(1,))
        return self._steps[key]

    def update(self,
               yolo_bboxes_xyxy: np.ndarray,
               yolo_confidences: np.ndarray,
               yolo_class_ids: np.ndarray,
               original_frame_bgr: np.ndarray
               ) -> List[Tuple[int, int, int, int, int, str, float]]:
        """Process one frame's detections; returns confirmed fresh tracks.

        Same contract as the reference (deepsort_tracker.py:63-141).
        """
        self.frame_count += 1
        n_det = self.params.max_detections

        boxes = np.asarray(yolo_bboxes_xyxy, np.float32).reshape(-1, 4)
        confs = np.asarray(yolo_confidences, np.float32).reshape(-1)
        clss = np.asarray(yolo_class_ids).reshape(-1).astype(np.int32)

        # class + confidence filter (deepsort_tracker.py:88-95)
        keep = []
        for i in range(len(boxes)):
            cid = int(clss[i])
            name = config.CLASSES[cid] if 0 <= cid < len(config.CLASSES) \
                else "Unknown"
            if confs[i] >= self.min_detection_confidence and \
                    name in config.CLASSES_TO_TRACK:
                keep.append(i)
        if len(keep) > n_det:
            self._dropped_host += len(keep) - n_det
            if not self._warned_capacity:
                import warnings
                warnings.warn(
                    f"frame {self.frame_count}: {len(keep)} filtered "
                    f"detections exceed max_detections={n_det}; dropping "
                    f"the extras (and only the first "
                    f"{self.max_reid_crops} get appearance features). "
                    "Raise max_detections/max_reid_crops for crowded "
                    "scenes; see .dropped_detections. (warned once)",
                    stacklevel=2)
                self._warned_capacity = True
        keep = keep[:n_det]

        d_xyxy = np.zeros((n_det, 4), np.float32)
        d_conf = np.zeros((n_det,), np.float32)
        d_cls = np.zeros((n_det,), np.int32)
        d_valid = np.zeros((n_det,), bool)
        k = len(keep)
        if k:
            d_xyxy[:k] = boxes[keep]
            d_conf[:k] = confs[keep]
            d_cls[:k] = clss[keep]
            d_valid[:k] = True

        step = self._get_step(original_frame_bgr.shape[:2])
        extra = {}
        if self._gmc is not None:
            extra["gmc"] = self._gmc.step(original_frame_bgr)
        self.state, outs = step(
            self.reid_model.params, self.state,
            jnp.asarray(original_frame_bgr),
            jnp.asarray(d_xyxy), jnp.asarray(d_conf),
            jnp.asarray(d_cls), jnp.asarray(d_valid), **extra)
        if self._capture:
            outs, d_feats, d_hasfeat = outs
            self.last_tlwh = np.concatenate(
                [d_xyxy[:k, :2], d_xyxy[:k, 2:] - d_xyxy[:k, :2]], axis=-1)
            self.last_conf = d_conf[:k].copy()
            self.last_class_id = d_cls[:k].copy()
            self.last_features = np.asarray(d_feats)[:k].copy()
            self.last_has_feature = np.asarray(d_hasfeat)[:k].copy()
        tlbr, ids, cls_ids, confs_out, mask = outs

        mask = np.asarray(mask)
        out = []
        for b, i, c, s in zip(np.asarray(tlbr)[mask], np.asarray(ids)[mask],
                              np.asarray(cls_ids)[mask],
                              np.asarray(confs_out)[mask]):
            name = config.CLASSES[int(c)] if 0 <= int(c) < len(config.CLASSES) \
                else "Unknown"
            out.append((int(round(float(b[0]))), int(round(float(b[1]))),
                        int(round(float(b[2]))), int(round(float(b[3]))),
                        int(i), name, float(s)))
        return out


if __name__ == "__main__":
    # inline lifecycle smoke test, reference-style
    # (deepsort_tracker.py:203-345): 4-frame scenario through the facade
    print("--- DeepSORT facade smoke test ---")
    ds = DeepSORT(n_init=2, max_age=5)
    frame = np.zeros((480, 640, 3), np.uint8)
    frame[100:200, 50:150] = 128  # a gray "person"
    box = np.array([[50.0, 100.0, 150.0, 200.0]], np.float32)

    out1 = ds.update(box, np.array([0.9]), np.array([0]), frame)
    assert out1 == [], "first sighting must be tentative"
    out2 = ds.update(box + 3, np.array([0.92]), np.array([0]), frame)
    assert len(out2) == 1 and out2[0][4] == 1, out2
    print("frame 2 confirmed:", out2)
    out3 = ds.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), frame)
    assert out3 == [], "missed frame emits nothing"
    out4 = ds.update(box + 6, np.array([0.95]), np.array([0]), frame)
    assert len(out4) == 1 and out4[0][4] == 1, "same id after a miss"
    print("frame 4 reacquired:", out4)
    print("--- PASSED ---")
