"""Fused per-chunk step: preprocess → detect → NMS → crops → ReID →
associate → track for K frames per dispatch, as ONE compiled XLA program.

This is the structural inversion of the reference's hot loop
(``aicamera_tracker.py:169-240``), which crossed the host/device boundary
five+ times per frame (cv2 preprocess → TRT detect → ``.item()`` sync →
host crop extraction → TRT ReID → NumPy tracker core). Here:

- All *batchable* work (letterbox, YOLOv8 forward, decode+NMS, crop gather,
  ReID embedding) runs batched over a K-frame chunk — large matmuls that
  keep the MXU fed (batch-1 conv at 640px starves it).
- The inherently sequential tracker core runs as a ``lax.scan`` over the
  chunk *inside the same program* — zero per-frame dispatch.
- Host↔device traffic is one uint8 frame-chunk upload and one delayed
  asynchronous readback per chunk. On tunneled TPU runtimes a blocking
  readback costs 30-80 ms of RPC latency; ``copy_to_host_async`` plus a
  one-chunk consumption delay hides it completely.

Outputs follow the reference contracts:
- detections: ``(num_dets, bboxes, scores, labels)`` in original frame
  coordinates (``YOLODetector.detect``, yolo_detector.py:68-149);
- tracks: confirmed, just-updated tracks as (tlbr, id, class, conf)
  (``DeepSORT.update``, deepsort_tracker.py:126-141).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..core import bytetrack as bt_core
from ..core import ocsort as oc_core
from ..core import state as core_state
from ..core import tracker as core_tracker
from ..core.state import Detections, TrackerParams
from ..ops import gmc as gmc_ops
from ..ops.crops import extract_reid_crops
from ..ops.nms import fused_decode_nms
from ..ops.pallas_preprocess import preprocess_yolo_pallas
from ..ops.preprocess import letterbox_spec, preprocess_yolo, scale_boxes_back
from .engine import enable_persistent_cache
from .params import resolve_reid_params, resolve_yolo_params


@dataclasses.dataclass
class FrameResult:
    """Host-side per-frame outputs."""
    frame_index: int
    det_boxes: np.ndarray     # (n, 4) xyxy in frame coords
    det_scores: np.ndarray    # (n,)
    det_labels: np.ndarray    # (n,) int32
    tracks: list              # [(x1, y1, x2, y2, id, class_name, conf), ...]


def _bucketed_time_scan(state, xs, make_body, params, t_small, k):
    """Per-frame tracker scan at a reduced track capacity when all activity
    fits, with exact high-slot-skip and mid-chunk-overflow fallbacks.

    Generic over the three cores (DeepSORT / ByteTrack / OC-SORT): any
    state whose non-scalar fields lead with the track axis, places new
    tracks at the lowest free slots, counts overflow in ``dropped`` and
    emits canonical zeros on masked output lanes (see
    core/state.py::slice_any_tracks). ``make_body(params) -> scan body``;
    the body must return 5-tuple outputs (boxes, ids, cls, conf, mask)
    shaped (T, ...). The scan is throughput-bound in padded track capacity
    (docs/ROOFLINE.md), so chunks whose live tracks fit in ``t_small``
    slots run a sliced state and pay ~T_small/T of the cost; a ``dropped``
    increment (the small table ran out of slots mid-chunk) triggers an
    exact full-capacity rerun of the whole chunk.
    """
    if not (t_small and t_small < params.max_tracks):
        return jax.lax.scan(make_body(params), state, xs)
    import dataclasses as _dc
    p_small = _dc.replace(params, max_tracks=t_small)
    pad_t = params.max_tracks - t_small

    def pad_outs(outs):
        return tuple(
            jnp.pad(a, ((0, 0), (0, pad_t)) + ((0, 0),) * (a.ndim - 2))
            for a in outs)

    def zero_outs():
        tlbr_z = jnp.zeros((k, params.max_tracks, 4), jnp.float32)
        i_z = jnp.zeros((k, params.max_tracks), jnp.int32)
        return (tlbr_z, i_z, i_z, tlbr_z[..., 0],
                jnp.zeros((k, params.max_tracks), jnp.bool_))

    def small_pass(_):
        small = core_state.slice_any_tracks(state, t_small)
        s_small, outs = jax.lax.scan(make_body(p_small), small, xs)
        return (core_state.splice_any_tracks(state, s_small),
                pad_outs(outs), s_small.dropped)

    def skip_small(_):
        # a high slot is active: force the full pass below
        return state, zero_outs(), state.dropped + 1

    # headroom guard: near-boundary steady load with per-chunk churn would
    # otherwise run the small scan, overflow, and pay the full rerun EVERY
    # chunk (slower than unbucketed)
    headroom = max(4, t_small // 4)
    fits = (~jnp.any(state.active[t_small:]) &
            (jnp.sum(state.active) <= t_small - headroom))
    cand_state, cand_outs, cand_dropped = jax.lax.cond(
        fits, small_pass, skip_small, None)
    # any dropped increment means the small table ran out of slots
    # mid-chunk (the full table would have placed those tracks)
    use_full = cand_dropped > state.dropped

    def full_pass(_):
        return jax.lax.scan(make_body(params), state, xs)

    def accept(_):
        return cand_state, cand_outs

    return jax.lax.cond(use_full, full_pass, accept, None)


def _format_tracks(tlbr, ids, cls, conf, mask):
    out = []
    for b, i, c, s in zip(tlbr[mask], ids[mask], cls[mask], conf[mask]):
        name = config.CLASSES[int(c)] if 0 <= int(c) < len(config.CLASSES) \
            else "Unknown"
        out.append((int(round(float(b[0]))), int(round(float(b[1]))),
                    int(round(float(b[2]))), int(round(float(b[3]))),
                    int(i), name, float(s)))
    return out


class TrackingPipeline:
    """End-to-end detector+tracker with chunked, fully-fused device steps."""

    def __init__(self,
                 variant: str = "n",
                 input_shape: Tuple[int, int] = config.YOLO_INPUT_SHAPE,
                 conf_threshold: float = config.YOLO_CONF_THRESHOLD,
                 nms_threshold: float = config.YOLO_NMS_THRESHOLD,
                 min_detection_confidence: float = config.DEEPSORT_MIN_CONFIDENCE,
                 yolo_weights: str | None = None,
                 reid_weights: str | None = None,
                 tracker_params: TrackerParams | None = None,
                 max_reid_crops: int = config.MAX_REID_CROPS,
                 chunk_size: int = 8,
                 preprocess_impl: str = "auto",
                 with_reid: bool = True,
                 synthetic_load: int = 0,
                 scan_bucket: int | None = 32,
                 letterbox_auto: bool = False,
                 tracker: str = "deepsort",
                 bytetrack_params: bt_core.ByteTrackParams | None = None,
                 ocsort_params: oc_core.OCSortParams | None = None,
                 gmc: str | bool = False,
                 nsa: bool = False,
                 reid_quant: str | None = None,
                 yolo_quant: str | None = None,
                 detect_dtype: str | None = None,
                 reid_dtype: str | None = None):
        """``synthetic_load=n`` fills the first n detection slots of every
        frame with synthetic tiled boxes (class person, conf 0.5) after
        NMS, regardless of what the detector found. This saturates the
        ReID crop bucket, the association cascade and the track table —
        the worst-case benchmark mode (real detections, when present,
        still occupy their slots first).

        ``scan_bucket``: capacity-bucketed tracker scan. When every active
        track lives in the first ``scan_bucket`` slots (the allocator
        always fills the lowest free slot, so this holds at normal load),
        the chunk's scan runs on a sliced ``scan_bucket``-slot state —
        the per-frame cost matrices, KF bank and assignment shrink with
        the padding (measured 26 -> 16 ms/chunk at T 128 -> 32 under
        realistic load, scripts/profile_scan_capacity.py). Exactness is
        guarded twice: the bucketed path is skipped when any high slot is
        active, and if the small table overflows mid-chunk (a new track
        found no free slot, visible as a ``dropped`` increment) the chunk
        is recomputed at full capacity inside the same program. None/0
        disables. Single-stream only — under vmap (multistream) both
        cond branches would execute.

        ``letterbox_auto``: run the detector on the reference letterbox
        utility's ``auto`` (minimum-rectangle, stride-32) canvas instead
        of the full ``input_shape`` square (image_processing.py:7-70's
        ``auto=True`` mode — ultralytics' own inference default).
        Any 16:9 source (540p/720p/1080p) then convolves a 384x640
        canvas instead of 640x640 (-40% rows) — the conv stack stops
        spending MXU time and HBM bandwidth on constant-114 padding.
        Detections can differ marginally at the canvas border vs the
        square mode (conv halo over pad rows), so this is opt-in; the
        default keeps the reference pipeline's exact ``auto=False``
        configuration.

        ``tracker``: ``"deepsort"`` (default — the reference algorithm),
        ``"strongsort"`` (the DeepSORT core with StrongSORT's upgrade
        preset: EMA appearance bank + NSA Kalman + ``gmc="affine"``; see
        :mod:`..strongsort_api`), ``"bytetrack"`` (:mod:`..core.bytetrack`
        — motion-only two-pass
        association), ``"botsort"`` (the same core with BoT-SORT's
        appearance fusion: the ReID embed stage runs and stages 1/3
        associate on min(IoU, masked cosine)), ``"ocsort"``
        (:mod:`..core.ocsort` — observation-centric SORT) or
        ``"deepocsort"`` (the same core with Deep OC-SORT's adaptively
        weighted appearance fusion + dynamic-alpha EMA banks,
        ``OCSortParams(with_appearance=True)``); tracker-
        algorithm integration is the reference README's own "Future
        Enhancements" list. ByteTrack and OC-SORT disable the ReID
        crop/embed stage entirely (no appearance model). ByteTrack and
        BoT-SORT feed the tracker every class-eligible detection above
        ``low_thresh`` (0.1) regardless of ``conf_threshold`` — the
        low-score second association is the algorithm's point — and the
        NMS score floor drops to ``low_thresh`` to surface those boxes;
        ``conf_threshold`` still governs the *detection output* lists.
        OC-SORT consumes only detections above its strict ``det_thresh``
        (0.6). The capacity-bucketed scan applies to all cores
        (``_bucketed_time_scan``) — the per-frame scans are
        throughput-bound in padded track capacity.

        ``gmc``: camera-motion compensation (:mod:`..ops.gmc` — a
        capability the static-camera reference lacks). ``"affine"`` (or
        ``True``) estimates an inter-frame camera affine by batched
        block phase correlation *inside the chunk program* and warps
        every live track's Kalman state (BoT-SORT's compensation,
        TPU-native estimate); ``"translation"`` restricts the model to
        pan. Applies to all three tracker cores. Off by default — on a
        genuinely static camera the estimate is the identity and only
        costs its FFTs.

        ``nsa``: StrongSORT's noise-scale-adaptive Kalman update for the
        DeepSORT core — matched corrections scale measurement noise by
        ``(1 - confidence)`` (:func:`..core.kalman.project`). Ignored if
        an explicit ``tracker_params`` is passed (set its ``nsa`` field
        instead); rejected for the motion-only cores.

        ``reid_quant``: ``"int8"`` runs the ReID embed stage through the
        W8A8 post-training-quantized twin net (:mod:`..models.quant` —
        per-channel int8 weights, per-crop dynamic int8 activations,
        int32 MXU accumulation). The embed forward is the dominant
        saturated-load cost (8x the detector's FLOPs, docs/ROOFLINE.md),
        and the MXU runs int8 at twice the bf16 rate. The TPU-native
        continuation of the reference's ``trtexec --fp16`` precision
        story (export_trt_engines.sh:37). ``None`` (default) keeps the
        bf16 path.

        ``yolo_quant``: ``"int8"`` runs the detector through the
        STATIC-calibrated W8A8 twin (:mod:`..models.quant_yolo`):
        activations are stored int8 between conv fusions (the forward is
        HBM-bound — docs/ROOFLINE.md), weights fold the calibration
        scales per input channel. Calibration happens once at
        construction over deterministic synthetic scenes; detections
        differ slightly from bf16 (quantization noise), so this is
        opt-in — quality gates live in benchmark config 28.

        ``detect_dtype``: ``"f32"`` runs the detect forward (preprocess,
        backbone, head, decode, NMS scoring) in full precision instead
        of the backend compute dtype (bf16 on TPU). bf16 activations
        carry ~3 significant digits, so near-tied candidate scores flip
        NMS ordering between batch shapes (chunk-96 here vs the batch-1
        facade — the agreement gap measured in
        docs/CLIP_PARITY_ADAPTED.md); f32 scores are batch-shape-stable
        at ~2x detect-forward cost. Opt-in for parity-critical
        deployments.

        ``reid_dtype``: the same option for the ReID embed stage. The
        facade embeds a fixed per-frame crop bucket while the chunked
        pipeline embeds load-adaptive buckets fused across the chunk —
        different batch shapes, so bf16 features differ in low bits and
        near-tied appearance costs flip assignments. ``"f32"`` makes the
        embed batch-shape-stable; combine with ``detect_dtype="f32"``
        (and ``preprocess_impl="xla"``) for the full parity mode
        measured in docs/CLIP_PARITY_ADAPTED.md."""
        enable_persistent_cache()
        self.tracker_kind = str(tracker)
        if self.tracker_kind == "strongsort":
            # Named preset (strongsort_api.py docstring): the DeepSORT
            # core with StrongSORT's upgrades — EMA appearance bank +
            # NSA Kalman + camera-motion compensation (GSI is offline,
            # see postprocess.py). Explicit tracker_params/gmc override.
            self.tracker_kind = "deepsort"
            if gmc in (False, None):      # unset -> the preset's default
                gmc = "affine"
            if tracker_params is None:
                tracker_params = TrackerParams(
                    max_cosine_distance=config.DEEPSORT_MAX_DIST,
                    nn_budget=1,          # EMA bank occupies slot 0 only
                    max_iou_distance=config.DEEPSORT_MAX_IOU_DISTANCE,
                    max_age=config.DEEPSORT_MAX_AGE,
                    n_init=config.DEEPSORT_N_INIT,
                    max_tracks=config.MAX_TRACKS,
                    max_detections=config.MAX_DETECTIONS,
                    feature_dim=config.REID_FEATURE_DIM,
                    ema_alpha=0.9,
                    nsa=True,
                )
                nsa = False   # folded into tracker_params above
        if self.tracker_kind not in ("deepsort", "bytetrack", "botsort",
                                     "ocsort", "deepocsort"):
            raise ValueError(f"tracker must be 'deepsort', 'strongsort', "
                             f"'bytetrack', 'botsort', 'ocsort' or "
                             f"'deepocsort' (got {tracker})")
        if nsa and self.tracker_kind != "deepsort":
            raise ValueError("nsa=True requires tracker='deepsort' (the "
                             "other cores take fixed-noise updates)")
        if nsa and tracker_params is not None:
            raise ValueError("pass nsa via tracker_params.nsa when "
                             "supplying explicit tracker_params")
        if bytetrack_params is not None and self.tracker_kind not in (
                "bytetrack", "botsort"):
            raise ValueError("bytetrack_params requires tracker='bytetrack' "
                             "or 'botsort'")
        if ocsort_params is not None and self.tracker_kind not in (
                "ocsort", "deepocsort"):
            raise ValueError("ocsort_params requires tracker='ocsort' "
                             "or 'deepocsort'")
        self.bytetrack_params = None
        self.ocsort_params = None
        if self.tracker_kind == "bytetrack":
            self.bytetrack_params = bytetrack_params or bt_core.ByteTrackParams(
                max_tracks=config.MAX_TRACKS,
                max_detections=config.MAX_DETECTIONS)
            if self.bytetrack_params.with_appearance:
                raise ValueError("with_appearance=True bytetrack_params "
                                 "require tracker='botsort'")
            with_reid = False
        elif self.tracker_kind == "botsort":
            self.bytetrack_params = bytetrack_params or bt_core.ByteTrackParams(
                max_tracks=config.MAX_TRACKS,
                max_detections=config.MAX_DETECTIONS,
                with_appearance=True,
                feature_dim=config.REID_FEATURE_DIM)
            if not self.bytetrack_params.with_appearance:
                raise ValueError("tracker='botsort' requires "
                                 "bytetrack_params.with_appearance=True "
                                 "(else it is plain ByteTrack)")
            with_reid = True
        elif self.tracker_kind == "ocsort":
            self.ocsort_params = ocsort_params or oc_core.OCSortParams(
                max_tracks=config.MAX_TRACKS,
                max_detections=config.MAX_DETECTIONS)
            if self.ocsort_params.with_appearance:
                raise ValueError("with_appearance=True ocsort_params "
                                 "require tracker='deepocsort'")
            with_reid = False
        elif self.tracker_kind == "deepocsort":
            self.ocsort_params = ocsort_params or oc_core.OCSortParams(
                max_tracks=config.MAX_TRACKS,
                max_detections=config.MAX_DETECTIONS,
                with_appearance=True,
                feature_dim=config.REID_FEATURE_DIM)
            if not self.ocsort_params.with_appearance:
                raise ValueError("tracker='deepocsort' requires "
                                 "ocsort_params.with_appearance=True "
                                 "(else it is plain OC-SORT)")
            with_reid = True
        if gmc in (False, None, "off", "none", ""):
            self.gmc_method = None
        elif gmc in (True, "affine"):
            self.gmc_method = "affine"
        elif gmc == "translation":
            self.gmc_method = "translation"
        else:
            raise ValueError(f"gmc must be off/affine/translation or a "
                             f"bool (got {gmc!r})")
        self._gmc_prev_frame = None
        self.synthetic_load = int(synthetic_load)
        self.scan_bucket = int(scan_bucket or 0)
        if self.scan_bucket < 0:
            raise ValueError(f"scan_bucket must be >= 0 (got {scan_bucket})")
        self.input_shape = tuple(input_shape)
        self.letterbox_auto = bool(letterbox_auto)
        self.conf_threshold = float(conf_threshold)
        self.nms_threshold = float(nms_threshold)
        self.min_detection_confidence = float(min_detection_confidence)
        self.max_reid_crops = int(max_reid_crops)
        self.chunk_size = int(chunk_size)
        import jax as _jax
        if preprocess_impl == "auto":
            preprocess_impl = ("pallas" if _jax.default_backend() == "tpu"
                               else "xla")
        self._preprocess = (preprocess_yolo_pallas
                            if preprocess_impl == "pallas"
                            else preprocess_yolo)
        self.with_reid = with_reid
        if detect_dtype not in (None, "bf16", "f32"):
            raise ValueError(f"detect_dtype must be None, 'bf16' or 'f32' "
                             f"(got {detect_dtype!r})")
        if detect_dtype == "f32" and yolo_quant == "int8":
            raise ValueError("detect_dtype='f32' and yolo_quant='int8' "
                             "conflict")
        import jax.numpy as _jnp
        self.detect_dtype = detect_dtype
        _yolo_dt = {None: None, "bf16": _jnp.bfloat16,
                    "f32": _jnp.float32}[detect_dtype]
        if reid_dtype not in (None, "bf16", "f32"):
            raise ValueError(f"reid_dtype must be None, 'bf16' or 'f32' "
                             f"(got {reid_dtype!r})")
        if reid_dtype == "f32" and reid_quant == "int8":
            raise ValueError("reid_dtype='f32' and reid_quant='int8' "
                             "conflict")
        self.reid_dtype = reid_dtype
        _reid_dt = {None: None, "bf16": _jnp.bfloat16,
                    "f32": _jnp.float32}[reid_dtype]
        self.yolo, self.yolo_params = resolve_yolo_params(
            variant, weights_path=yolo_weights, dtype=_yolo_dt)
        self.reid, self.reid_params = resolve_reid_params(
            weights_path=reid_weights, dtype=_reid_dt)
        if reid_quant not in (None, "", "none", "int8"):
            raise ValueError(
                f"reid_quant must be None or 'int8' (got {reid_quant!r})")
        self.reid_quant = reid_quant if reid_quant == "int8" else None
        if self.reid_quant == "int8":
            from ..models.quant import QuantReIDNet, quantize_reid_params
            self.reid = QuantReIDNet(feature_dim=config.REID_FEATURE_DIM)
            self.reid_params = quantize_reid_params(self.reid_params)
        if yolo_quant not in (None, "", "none", "int8"):
            raise ValueError(
                f"yolo_quant must be None or 'int8' (got {yolo_quant!r})")
        self.yolo_quant = yolo_quant if yolo_quant == "int8" else None
        if self.yolo_quant == "int8":
            self._quantize_yolo()
        self._dtype = self.yolo.dtype
        self.tracker_params = tracker_params or TrackerParams(
            max_cosine_distance=config.DEEPSORT_MAX_DIST,
            nn_budget=config.DEEPSORT_NN_BUDGET,
            max_iou_distance=config.DEEPSORT_MAX_IOU_DISTANCE,
            max_age=config.DEEPSORT_MAX_AGE,
            n_init=config.DEEPSORT_N_INIT,
            max_tracks=config.MAX_TRACKS,
            max_detections=config.MAX_DETECTIONS,
            feature_dim=config.REID_FEATURE_DIM,
            nsa=bool(nsa),
        )
        # crops are gathered from the detection slots, so more crop
        # capacity than detection slots is unreachable (and would break
        # the bucketed gather's static reshape)
        if self.tracker_kind == "botsort":
            _det_cap = self.bytetrack_params.max_detections
        elif self.tracker_kind == "deepocsort":
            _det_cap = self.ocsort_params.max_detections
        else:
            _det_cap = self.tracker_params.max_detections
        self.max_reid_crops = min(self.max_reid_crops, _det_cap)
        self._track_class_ids = jnp.asarray(
            config.CLASS_IDS_TO_TRACK, jnp.int32)
        self._nms_score_floor = config.YOLO_NMS_SCORE_THRESHOLD
        if self.tracker_kind in ("bytetrack", "botsort"):
            self._nms_score_floor = min(self._nms_score_floor,
                                        self.bytetrack_params.low_thresh)
        elif self.tracker_kind in ("ocsort", "deepocsort"):
            # a custom det_thresh below the NMS default must still reach
            # the core's own strict gate — otherwise the fused pipeline
            # silently starves detections in (det_thresh, 0.25) that a
            # facade fed by a same-threshold detector would accept
            self._nms_score_floor = min(self._nms_score_floor,
                                        self.ocsort_params.det_thresh)
        self.state = self._init_tracker_state()
        self._steps = {}

    def _quantize_yolo(self):
        """Calibrate + build the static-int8 detector twin (quant_yolo.py,
        deterministic synthetic calibration — see
        :func:`..models.quant_yolo.quantize_yolo_synthetic`)."""
        from ..models.quant_yolo import quantize_yolo_synthetic
        self.yolo, self.yolo_params = quantize_yolo_synthetic(
            self.yolo_params, self.yolo.variant, self.yolo.num_classes,
            self.input_shape, letterbox_auto=self.letterbox_auto)

    def _init_tracker_state(self):
        if self.tracker_kind in ("bytetrack", "botsort"):
            return bt_core.init_state(self.bytetrack_params)
        if self.tracker_kind in ("ocsort", "deepocsort"):
            return oc_core.init_state(self.ocsort_params)
        return core_state.init_state(self.tracker_params)

    # --- step construction ---------------------------------------------------

    def _make_chunk_step(self, frame_hw: Tuple[int, int], k: int):
        spec = letterbox_spec(frame_hw, self.input_shape,
                              auto=self.letterbox_auto)
        p = self.tracker_params
        botsort = self.tracker_kind == "botsort"
        bytetrack = self.tracker_kind in ("bytetrack", "botsort")
        deepocsort = self.tracker_kind == "deepocsort"
        ocsort = self.tracker_kind in ("ocsort", "deepocsort")
        if bytetrack:
            n_det = self.bytetrack_params.max_detections
        elif ocsort:
            n_det = self.ocsort_params.max_detections
        else:
            n_det = p.max_detections
        if botsort:
            feature_dim = self.bytetrack_params.feature_dim
        elif deepocsort:
            feature_dim = self.ocsort_params.feature_dim
        else:
            feature_dim = p.feature_dim
        n_crops = self.max_reid_crops
        with_reid = self.with_reid
        use_gmc = self.gmc_method is not None
        if use_gmc:
            gspec = gmc_ops.gmc_spec(frame_hw)

        n_syn = min(self.synthetic_load, n_det)
        if n_syn:
            # static 8x8 grid of boxes spanning the frame (worst-case mode)
            fh, fw = frame_hw
            gi = np.arange(n_det)
            gx = (gi % 8) * (fw / 8.0)
            gy = ((gi // 8) % 8) * (fh / 8.0)
            syn_boxes = jnp.asarray(np.stack(
                [gx + 2, gy + 2, gx + fw / 8.0 - 2, gy + fh / 8.0 - 2],
                axis=-1).astype(np.float32))

        def detect_batch(yolo_params, frames):
            """Batched detection over the chunk: (K,H,W,3)u8 -> NMS outs."""
            x = jax.vmap(
                lambda f: self._preprocess(f, spec, out_dtype=self._dtype)[0]
            )(frames)  # (K, Dh, Dw, 3)
            levels = self.yolo.apply(yolo_params, x)
            num, nboxes, nscores, nlabels = fused_decode_nms(
                levels,
                score_threshold=self._nms_score_floor,
                iou_threshold=self.nms_threshold,
                top_k=config.YOLO_NMS_TOPK,
                max_det=config.YOLO_MAX_DETECTIONS)
            boxes_frame = jax.vmap(lambda b: scale_boxes_back(b, spec))(nboxes)
            return num, boxes_frame, nscores, nlabels

        def compact_dets(num, boxes, scores, labels):
            """Per-frame: compact tracker-eligible dets into padded slots."""
            present = jnp.arange(boxes.shape[0]) < num
            det_valid = present & (scores >= self.conf_threshold)
            trackable = jnp.any(
                labels[:, None] == self._track_class_ids[None, :], axis=1)
            if bytetrack:
                # the tracker must see every box above its low-score floor
                # (strictly; at-or-below is invisible to all BYTE stages) —
                # independent of conf_threshold, which only gates the
                # *detection output* lists above.
                elig = present & trackable & \
                    (scores > self.bytetrack_params.low_thresh)
            elif ocsort:
                # the step applies the same strict gate itself; filtering
                # here just frees detection slots
                elig = present & trackable & \
                    (scores > self.ocsort_params.det_thresh)
            else:
                elig = det_valid & trackable & \
                    (scores >= self.min_detection_confidence)
            rank = jnp.cumsum(elig) - 1
            slot = jnp.where(elig & (rank < n_det), rank, n_det)

            def compact(vals):
                arr = jnp.zeros((n_det + 1,) + vals.shape[1:], vals.dtype)
                return arr.at[slot].set(vals)[:n_det]

            return (compact(boxes), compact(scores),
                    compact(labels.astype(jnp.int32)), compact(elig),
                    det_valid)

        def step(yolo_params, reid_params, state, frames, frame_valid,
                 prev_frame=None):
            if use_gmc:
                # camera motion per frame, estimated inside the same
                # program (K+1 pooled-gray FFTs; no host round trip).
                # Callers that drive the raw step without a prev frame
                # (benchmark timing passes) get identity motion at the
                # chunk head; _dispatch_chunk always carries the real one.
                prev = frames[0] if prev_frame is None else prev_frame
                g_a, g_t = gmc_ops.estimate_chunk(
                    prev, frames, gspec, self.gmc_method)
                gmc_xs = (g_a, g_t)
            else:
                gmc_xs = ()
            num, boxes_f, scores, labels = detect_batch(yolo_params, frames)
            d_xyxy, d_conf, d_cls, d_valid, det_valid = jax.vmap(compact_dets)(
                num, boxes_f, scores, labels)  # (K, n_det, ...)

            if n_syn:
                # fill empty slots (real dets are compacted to the front)
                # with the synthetic grid up to n_syn per frame
                fill = (jnp.arange(n_det) < n_syn)[None, :] & ~d_valid
                d_xyxy = jnp.where(fill[..., None], syn_boxes[None], d_xyxy)
                d_conf = jnp.where(fill, 0.5, d_conf)
                d_cls = jnp.where(fill, 0, d_cls)  # person
                d_valid = d_valid | fill

            if with_reid:
                # Load-adaptive crop bucketing (the analog of the reference
                # TRT engine's dynamic batch 1..8, export_trt_engines.sh:
                # 32-34): embed only as many crop slots as the busiest frame
                # in the chunk needs, via static-size branches. Detections
                # are compacted to the front of their slots, so a bucket
                # covering the per-frame maximum preserves semantics exactly.
                # Bucket 0 skips the crop gather + ReID forward outright on
                # chunks with no trackable detections (the whole embed
                # subgraph is dead work there). Bucket spacing is deliberately
                # dense in the 8-32 range: the embed forward is the dominant
                # realistic-load cost (37 ms/chunk at batch 16*96 on v5e,
                # scripts/profile_synthetic_load.py) and scales linearly with
                # the bucket, so a 16 bucket serving ~10 dets/frame wastes
                # ~40% of the embedder's FLOPs on padding.
                buckets = [0] + [b for b in (4, 8, 12, 16, 24)
                                 if b < n_crops] + [n_crops]
                n_needed = jnp.max(jnp.sum(d_valid[:, :n_crops], axis=1))

                def make_branch(b):
                    def branch(_):
                        fpad = jnp.zeros((k, n_crops, feature_dim),
                                         jnp.float32)
                        vpad = jnp.zeros((k, n_crops), jnp.bool_)
                        if b == 0:
                            return fpad, vpad
                        crops, crop_valid = jax.vmap(
                            lambda fr, bx: extract_reid_crops(
                                fr, bx, out_hw=config.REID_INPUT_SHAPE)
                        )(frames, d_xyxy[:, :b])  # (K, b, 128, 64, 3)
                        feats = self.reid.apply(
                            reid_params,
                            crops.reshape(k * b, *crops.shape[2:]))
                        feats = feats.reshape(k, b, -1).astype(jnp.float32)
                        return (fpad.at[:, :b].set(feats),
                                vpad.at[:, :b].set(crop_valid))
                    return branch

                idx = sum(jnp.int32(n_needed > b) for b in buckets[:-1])
                feats, crop_valid = jax.lax.switch(
                    idx, [make_branch(b) for b in buckets], operand=None)
                d_feats = jnp.zeros((k, n_det, feature_dim), jnp.float32)
                d_feats = d_feats.at[:, :n_crops].set(feats)
                d_hasfeat = jnp.zeros((k, n_det), jnp.bool_).at[:, :n_crops].set(
                    crop_valid & d_valid[:, :n_crops])
            else:
                d_feats = jnp.zeros((k, n_det, feature_dim), jnp.float32)
                d_hasfeat = jnp.zeros((k, n_det), jnp.bool_)

            tlwh = jnp.concatenate(
                [d_xyxy[..., :2], d_xyxy[..., 2:] - d_xyxy[..., :2]], axis=-1)

            if bytetrack:
                # botsort = the same core with appearance: the per-frame
                # xs carry the ReID features from the shared embed stage
                n_fixed = 7 if botsort else 5

                def make_scan_body_bt(pp):
                    def scan_body_bt(st, per_frame):
                        if botsort:
                            (f_tlwh, f_conf, f_cls, f_feats, f_hasfeat,
                             f_valid, f_frame_valid) = per_frame[:7]
                        else:
                            (f_tlwh, f_conf, f_cls, f_valid,
                             f_frame_valid) = per_frame[:5]
                            f_feats = f_hasfeat = None
                        f_gmc = (tuple(per_frame[n_fixed:])
                                 if use_gmc else None)
                        dets = bt_core.ByteDetections(
                            tlwh=f_tlwh, score=f_conf, class_id=f_cls,
                            valid=f_valid, feature=f_feats,
                            has_feature=f_hasfeat)
                        st = jax.lax.cond(
                            f_frame_valid,
                            lambda s: bt_core.step(s, dets, pp, gmc=f_gmc),
                            lambda s: s, st)
                        return st, bt_core.get_outputs(st)
                    return scan_body_bt

                if botsort:
                    xs_bt = (tlwh, d_conf, d_cls, d_feats, d_hasfeat,
                             d_valid, frame_valid) + gmc_xs
                else:
                    xs_bt = (tlwh, d_conf, d_cls, d_valid,
                             frame_valid) + gmc_xs
                state, track_outs = _bucketed_time_scan(
                    state, xs_bt,
                    make_scan_body_bt, self.bytetrack_params,
                    self.scan_bucket, k)
                det_outs = (num, boxes_f, scores, labels, det_valid)
                return state, det_outs, track_outs

            if ocsort:
                # deepocsort = the same core with appearance: the per-frame
                # xs carry the ReID features from the shared embed stage
                n_fixed_oc = 7 if deepocsort else 5

                def make_scan_body_oc(pp):
                    def scan_body_oc(st, per_frame):
                        if deepocsort:
                            (f_xyxy, f_conf, f_cls, f_feats, f_hasfeat,
                             f_valid, f_frame_valid) = per_frame[:7]
                        else:
                            (f_xyxy, f_conf, f_cls, f_valid,
                             f_frame_valid) = per_frame[:5]
                            f_feats = f_hasfeat = None
                        f_gmc = (tuple(per_frame[n_fixed_oc:])
                                 if use_gmc else None)
                        dets = oc_core.OCSortDetections(
                            xyxy=f_xyxy, score=f_conf, class_id=f_cls,
                            valid=f_valid, feature=f_feats,
                            has_feature=f_hasfeat)
                        st = jax.lax.cond(
                            f_frame_valid,
                            lambda s: oc_core.step(s, dets, pp, gmc=f_gmc),
                            lambda s: s, st)
                        return st, oc_core.get_outputs(st, pp)
                    return scan_body_oc

                if deepocsort:
                    xs_oc = (d_xyxy, d_conf, d_cls, d_feats, d_hasfeat,
                             d_valid, frame_valid) + gmc_xs
                else:
                    xs_oc = (d_xyxy, d_conf, d_cls, d_valid,
                             frame_valid) + gmc_xs
                state, track_outs = _bucketed_time_scan(
                    state, xs_oc,
                    make_scan_body_oc, self.ocsort_params,
                    self.scan_bucket, k)
                det_outs = (num, boxes_f, scores, labels, det_valid)
                return state, det_outs, track_outs

            def make_scan_body(pp):
                def scan_body(st, per_frame):
                    (f_tlwh, f_conf, f_cls, f_feats, f_hasfeat, f_valid,
                     f_frame_valid) = per_frame[:7]
                    f_gmc = tuple(per_frame[7:]) if use_gmc else None
                    dets = Detections(tlwh=f_tlwh, conf=f_conf,
                                      class_id=f_cls, feature=f_feats,
                                      has_feature=f_hasfeat, valid=f_valid)

                    def do(st):
                        st = core_tracker.predict(st, pp)
                        if f_gmc is not None:
                            # BoT-SORT ordering: predict, then warp by the
                            # camera affine, then associate
                            m, c = gmc_ops.warp_xyah_bank(
                                st.mean, st.cov, f_gmc[0], f_gmc[1],
                                st.active)
                            st = st.replace(mean=m, cov=c)
                        return core_tracker.update(st, dets, pp)

                    # padding frames at a clip's tail leave state untouched
                    st = jax.lax.cond(f_frame_valid, do, lambda s: s, st)
                    return st, core_tracker.get_outputs(st)
                return scan_body

            xs = (tlwh, d_conf, d_cls, d_feats, d_hasfeat, d_valid,
                  frame_valid) + gmc_xs
            state, track_outs = _bucketed_time_scan(
                state, xs, make_scan_body, p, self.scan_bucket, k)
            # track_outs: (tlbr, ids, cls, conf, mask), each (K, T, ...)
            det_outs = (num, boxes_f, scores, labels, det_valid)
            return state, det_outs, track_outs

        return jax.jit(step, donate_argnums=(2,))

    def _get_step(self, frame_hw: Tuple[int, int], k: int):
        key = (tuple(frame_hw), k)
        if key not in self._steps:
            self._steps[key] = self._make_chunk_step(key[0], k)
        return self._steps[key]

    # --- host API --------------------------------------------------------------

    def reset(self):
        """Fresh tracker state (ids restart at 1, reference track.py:160)."""
        self.state = self._init_tracker_state()
        self._gmc_prev_frame = None

    def _dispatch_chunk(self, frames_np: np.ndarray, n_valid: int | None = None):
        """Upload one (K,H,W,3) chunk and dispatch the fused step (async)."""
        k = frames_np.shape[0]
        n_valid = k if n_valid is None else n_valid
        step = self._get_step(frames_np.shape[1:3], k)
        frames_dev = jnp.asarray(frames_np)
        frame_valid = jnp.arange(k) < n_valid
        extra = ()
        if self.gmc_method is not None:
            # frame before this chunk; for the very first chunk the
            # chunk's own first frame (identity motion for frame 0)
            prev = (self._gmc_prev_frame if self._gmc_prev_frame is not None
                    else frames_np[0])
            extra = (jnp.asarray(prev),)
            self._gmc_prev_frame = frames_np[n_valid - 1].copy()
        self.state, det_outs, track_outs = step(
            self.yolo_params, self.reid_params, self.state, frames_dev,
            frame_valid, *extra)
        for leaf in (*det_outs, *track_outs):
            leaf.copy_to_host_async()
        return det_outs, track_outs

    @staticmethod
    def _emit(det_outs, track_outs, base_index: int, count: int):
        num, boxes, scores, labels, det_valid = jax.device_get(det_outs)
        tlbr, ids, cls, conf, mask = jax.device_get(track_outs)
        results = []
        for i in range(count):
            v = det_valid[i]
            results.append(FrameResult(
                frame_index=base_index + i,
                det_boxes=boxes[i][v],
                det_scores=scores[i][v],
                det_labels=labels[i][v].astype(np.int32),
                tracks=_format_tracks(tlbr[i], ids[i], cls[i], conf[i],
                                      mask[i]),
            ))
        return results

    def process_frames(self, frames: Iterator[np.ndarray],
                       chunk_size: int | None = None
                       ) -> Iterator[FrameResult]:
        """Stream frames through the tracker; yields FrameResult per frame.

        Frames are grouped into fixed-size chunks; results are consumed one
        chunk behind the dispatch so device work, host decode and readback
        RPCs all overlap. The final partial chunk is padded and the padding
        results discarded (tracker state from padding frames is rolled back
        by processing padding as empty — see below).
        """
        k = chunk_size or self.chunk_size
        pending = None  # (det_outs, track_outs, base_index, count)
        buf = []
        base = 0

        def flush(buf, base):
            nonlocal pending
            count = len(buf)
            if count < k:
                pad = [buf[-1]] * (k - count)  # padded steps are masked out
                chunk = np.stack(buf + pad)
            else:
                chunk = np.stack(buf)
            outs = self._dispatch_chunk(chunk, n_valid=count)
            prev, pending = pending, (*outs, base, count)
            if prev is not None:
                yield from self._emit(prev[0], prev[1], prev[2], prev[3])

        for frame in frames:
            buf.append(frame)
            if len(buf) == k:
                yield from flush(buf, base)
                base += k
                buf = []
        if buf:
            yield from flush(buf, base)
        if pending is not None:
            yield from self._emit(pending[0], pending[1], pending[2],
                                  pending[3])

    def process_chunks(self, chunks: Iterator[np.ndarray],
                       chunk_size: int | None = None
                       ) -> Iterator[FrameResult]:
        """Chunk-granular streaming: like :meth:`process_frames` but each
        item is already an ``(n, H, W, 3)`` uint8 array with ``n <= K``
        (e.g. from ``NativeVideoReader.read_chunk`` — ONE Python crossing
        per device dispatch instead of one per frame, and no per-frame
        re-stacking). Partial chunks are padded to K (padding masked out
        on device, same as :meth:`process_frames`); results are consumed
        one chunk behind dispatch so decode, device work and readback
        overlap."""
        k = chunk_size or self.chunk_size
        pending = None
        base = 0
        for chunk in chunks:
            n = chunk.shape[0]
            if n == 0:
                # transient empty batch (e.g. an upstream filter passing
                # nothing through) — skip it; only generator exhaustion
                # ends the stream
                continue
            if n > k:
                raise ValueError(f"chunk of {n} frames exceeds the "
                                 f"pipeline chunk_size {k}")
            if n < k:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], k - n, axis=0)], axis=0)
            outs = self._dispatch_chunk(chunk, n_valid=n)
            prev, pending = pending, (*outs, base, n)
            base += n
            if prev is not None:
                yield from self._emit(*prev)
        if pending is not None:
            yield from self._emit(*pending)

    def process_frame(self, frame_bgr: np.ndarray) -> FrameResult:
        """Single-frame convenience API (chunk of 1, synchronous readback).

        For throughput use :meth:`process_frames`; this exists for the
        reference-style frame-at-a-time usage and webcam latency mode.
        """
        det_outs, track_outs = self._dispatch_chunk(frame_bgr[None])
        return self._emit(det_outs, track_outs, 0, 1)[0]

    def warm_up(self, frame_hw: Tuple[int, int], chunk_size: int | None = None,
                iters: int = 2) -> float:
        """Compile + warm the chunk step for a frame shape; returns seconds."""
        import time
        t0 = time.perf_counter()
        k = chunk_size or self.chunk_size
        dummy = np.zeros((k, *frame_hw, 3), np.uint8)
        for _ in range(iters):
            outs = self._dispatch_chunk(dummy)
        jax.block_until_ready(outs)
        self.reset()
        return time.perf_counter() - t0
