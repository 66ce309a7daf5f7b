"""Batched multi-stream tracking, sharded across chips over a device mesh.

Design (BASELINE.json config 4: "8x 720p streams with batched ReID crops"):

- Every stream keeps an independent ``TrackerState``; states are stacked on
  a leading ``stream`` axis and the whole tracker step is ``jax.vmap``-ed
  over it (the association while-loops vectorize across streams).
- Detection work for all streams rides the batch axis of one YOLOv8
  forward — S streams x K frames fold into one (S*K) conv batch that keeps
  the MXU saturated.
- Scale-out: a 1-D ``Mesh(('stream',))``; frames and tracker states are
  sharded on the stream axis (``NamedSharding``), model params replicated.
  Since tracking state never crosses streams, XLA inserts **no collectives**
  on the hot path — each chip runs its shard of streams independently over
  ICI-free compute. This is the TPU-idiomatic replacement for the
  reference's absent multi-GPU path (SURVEY.md §2 parallelism accounting).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config
from ..core import bytetrack as bt_core
from ..core import ocsort as oc_core
from ..core import state as core_state
from ..core import tracker as core_tracker
from ..core.state import Detections, TrackerParams
from ..ops.crops import extract_reid_crops
from ..ops.nms import fused_decode_nms
from ..ops.pallas_preprocess import preprocess_yolo_pallas
from ..ops.preprocess import letterbox_spec, preprocess_yolo, scale_boxes_back
from ..runtime.params import resolve_reid_params, resolve_yolo_params


def make_stream_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over available devices with a single 'stream' axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("stream",))


def make_mesh(n_stream: int, n_model: int = 1) -> Mesh:
    """2-D ('stream', 'model') mesh: data parallelism over streams x tensor
    parallelism over conv output channels (for the large YOLOv8 variants).

    With ``n_model == 1`` this degenerates to the pure stream mesh; the
    collectives XLA inserts for the model axis ride ICI neighbors when the
    mesh is laid out with 'model' as the minor (fastest-varying) axis, which
    this construction does."""
    need = n_stream * n_model
    devs = jax.devices()
    if len(devs) < need:
        raise ValueError(f"mesh {n_stream}x{n_model} needs {need} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_stream, n_model),
                ("stream", "model"))


class MultiStreamPipeline:
    """Detect+track S independent streams per step, sharded over a mesh.

    Args:
        n_streams: number of parallel video streams (divisible by mesh size).
        mesh: device mesh with a 'stream' axis; None = single device.
    """

    def __init__(self,
                 n_streams: int,
                 frame_hw: Tuple[int, int],
                 mesh: Mesh | None = None,
                 variant: str = "n",
                 input_shape: Tuple[int, int] = config.YOLO_INPUT_SHAPE,
                 conf_threshold: float = config.YOLO_CONF_THRESHOLD,
                 nms_threshold: float = config.YOLO_NMS_THRESHOLD,
                 min_detection_confidence: float = config.DEEPSORT_MIN_CONFIDENCE,
                 tracker_params: TrackerParams | None = None,
                 max_reid_crops: int = config.MAX_REID_CROPS,
                 preprocess_impl: str = "auto",
                 yolo_weights: str | None = None,
                 reid_weights: str | None = None,
                 scan_bucket: int | None = 32,
                 letterbox_auto: bool = False,
                 tracker: str = "deepsort",
                 bytetrack_params: "bt_core.ByteTrackParams | None" = None,
                 ocsort_params: "oc_core.OCSortParams | None" = None,
                 gmc: str | bool = False,
                 reid_quant: str | None = None):
        self.n_streams = int(n_streams)
        self.frame_hw = tuple(frame_hw)
        self.mesh = mesh
        # camera-motion compensation (see TrackingPipeline's gmc docstring):
        # estimated per stream inside the program — stream-local FFTs and
        # fits, so the zero-hot-path-collectives invariant holds on a mesh.
        # With frame_valid masking, masked slots should repeat the stream's
        # last valid frame (identity motion) so the estimate chain stays
        # meaningful; the tracker itself skips masked steps either way.
        if gmc in (False, None, "off", "none", ""):
            self.gmc_method = None
        elif gmc in (True, "affine"):
            self.gmc_method = "affine"
        elif gmc == "translation":
            self.gmc_method = "translation"
        else:
            raise ValueError(f"gmc must be off/affine/translation or a "
                             f"bool (got {gmc!r})")
        self._gmc_prev = None          # (S, H, W, 3) host carry
        # alternative tracker cores (same semantics as TrackingPipeline's
        # ``tracker`` argument): bytetrack/ocsort are motion-only (no ReID
        # stage in the device program); botsort keeps the embed stage and
        # fuses appearance into the BYTE association; ByteTrack-family
        # cores additionally surface low-score boxes
        self.tracker_kind = str(tracker)
        if self.tracker_kind == "strongsort":
            # named preset (strongsort_api.py): DeepSORT core + EMA bank
            # + NSA Kalman + affine GMC (per-stream, still collective-free)
            self.tracker_kind = "deepsort"
            if self.gmc_method is None and gmc in (False, None):
                self.gmc_method = "affine"
            if tracker_params is None:
                tracker_params = TrackerParams(
                    max_cosine_distance=config.DEEPSORT_MAX_DIST,
                    nn_budget=1,
                    max_iou_distance=config.DEEPSORT_MAX_IOU_DISTANCE,
                    max_age=config.DEEPSORT_MAX_AGE,
                    n_init=config.DEEPSORT_N_INIT,
                    max_tracks=config.MAX_TRACKS,
                    max_detections=config.MAX_DETECTIONS,
                    feature_dim=config.REID_FEATURE_DIM,
                    ema_alpha=0.9,
                    nsa=True,
                )
        if self.tracker_kind not in ("deepsort", "bytetrack", "botsort",
                                     "ocsort", "deepocsort"):
            raise ValueError(f"tracker must be 'deepsort', 'strongsort', "
                             f"'bytetrack', 'botsort', 'ocsort' or "
                             f"'deepocsort' (got {tracker})")
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
        elif self.tracker_kind == "botsort":
            self.bytetrack_params = bytetrack_params or bt_core.ByteTrackParams(
                max_tracks=config.MAX_TRACKS,
                max_detections=config.MAX_DETECTIONS,
                with_appearance=True,
                feature_dim=config.REID_FEATURE_DIM)
            if not self.bytetrack_params.with_appearance:
                raise ValueError("tracker='botsort' requires "
                                 "bytetrack_params.with_appearance=True")
        elif self.tracker_kind == "ocsort":
            self.ocsort_params = ocsort_params or oc_core.OCSortParams(
                max_tracks=config.MAX_TRACKS,
                max_detections=config.MAX_DETECTIONS)
            if self.ocsort_params.with_appearance:
                raise ValueError("with_appearance=True ocsort_params "
                                 "require tracker='deepocsort'")
        elif self.tracker_kind == "deepocsort":
            self.ocsort_params = ocsort_params or oc_core.OCSortParams(
                max_tracks=config.MAX_TRACKS,
                max_detections=config.MAX_DETECTIONS,
                with_appearance=True,
                feature_dim=config.REID_FEATURE_DIM)
            if not self.ocsort_params.with_appearance:
                raise ValueError("tracker='deepocsort' requires "
                                 "ocsort_params.with_appearance=True")
        # capacity-bucketed time scan (see runtime/pipeline.py): only on a
        # single device — with a mesh, the fits predicate would reduce over
        # sharded states (a hot-path collective), and zero hot-path
        # collectives is a design invariant here
        self.scan_bucket = int(scan_bucket or 0) if mesh is None else 0
        if self.scan_bucket < 0:
            raise ValueError(f"scan_bucket must be >= 0 (got {scan_bucket})")
        self.input_shape = tuple(input_shape)
        # reference letterbox `auto` (minimum-rectangle) canvas — see
        # TrackingPipeline's letterbox_auto docstring
        self.letterbox_auto = bool(letterbox_auto)
        self.conf_threshold = float(conf_threshold)
        self.nms_threshold = float(nms_threshold)
        self.min_detection_confidence = float(min_detection_confidence)
        self.max_reid_crops = int(max_reid_crops)
        import jax as _jax
        if preprocess_impl == "auto":
            preprocess_impl = ("pallas" if _jax.default_backend() == "tpu"
                               else "xla")
        self._preprocess = (preprocess_yolo_pallas
                            if preprocess_impl == "pallas"
                            else preprocess_yolo)
        self.yolo, self.yolo_params = resolve_yolo_params(
            variant, weights_path=yolo_weights)
        self.reid, self.reid_params = resolve_reid_params(
            weights_path=reid_weights)
        if reid_quant not in (None, "", "none", "int8"):
            raise ValueError(
                f"reid_quant must be None or 'int8' (got {reid_quant!r})")
        self.reid_quant = reid_quant if reid_quant == "int8" else None
        if self.reid_quant == "int8":
            # W8A8 embed stage (models/quant.py, same as TrackingPipeline's
            # reid_quant); the quantized tree replicates over the mesh like
            # the f32 one — it is still just a pytree of arrays
            from ..models.quant import QuantReIDNet, quantize_reid_params
            self.reid = QuantReIDNet(feature_dim=config.REID_FEATURE_DIM)
            self.reid_params = quantize_reid_params(self.reid_params)
        self._dtype = self.yolo.dtype
        self.tracker_params = tracker_params or TrackerParams(
            max_tracks=config.MAX_TRACKS,
            max_detections=config.MAX_DETECTIONS,
            feature_dim=config.REID_FEATURE_DIM)
        self._track_class_ids = jnp.asarray(
            config.CLASS_IDS_TO_TRACK, jnp.int32)
        self._nms_score_floor = config.YOLO_NMS_SCORE_THRESHOLD
        if self.tracker_kind in ("bytetrack", "botsort"):
            # BYTE's second association feeds on the low-score boxes other
            # pipelines discard (see runtime/pipeline.py)
            self._nms_score_floor = min(self._nms_score_floor,
                                        self.bytetrack_params.low_thresh)
        elif self.tracker_kind in ("ocsort", "deepocsort"):
            # a sub-0.25 det_thresh must reach the core's own strict gate
            # (see runtime/pipeline.py)
            self._nms_score_floor = min(self._nms_score_floor,
                                        self.ocsort_params.det_thresh)

        # per-stream tracker states stacked on the leading stream axis
        states = jax.vmap(
            lambda _: self._init_one_state()
        )(jnp.arange(self.n_streams))
        if mesh is not None:
            state_sharding = jax.tree.map(
                lambda _: NamedSharding(mesh, P("stream")), states)
            states = jax.device_put(states, state_sharding)
            self._frames_sharding = NamedSharding(mesh, P("stream"))
            self._replicated = NamedSharding(mesh, P())
            if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                # tensor parallelism: conv output channels sharded on the
                # 'model' axis; GSPMD partitions every conv and inserts the
                # ICI collectives at sharding changes (tensor_parallel.py)
                from .tensor_parallel import shard_detector_params
                self.yolo_params = shard_detector_params(
                    self.yolo_params, mesh)
            else:
                self.yolo_params = jax.device_put(self.yolo_params,
                                                  self._replicated)
            self.reid_params = jax.device_put(self.reid_params,
                                              self._replicated)
        else:
            self._frames_sharding = None
        self.states = states
        self._step, self._chunk_step = self._build_step()

    def _init_one_state(self):
        if self.tracker_kind in ("bytetrack", "botsort"):
            return bt_core.init_state(self.bytetrack_params)
        if self.tracker_kind in ("ocsort", "deepocsort"):
            return oc_core.init_state(self.ocsort_params)
        return core_state.init_state(self.tracker_params)

    def _build_step(self):
        spec = letterbox_spec(self.frame_hw, self.input_shape,
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
        with_reid = self.tracker_kind in ("deepsort", "botsort",
                                          "deepocsort")
        # crops are gathered from the detection slots, so more crop
        # capacity than detection slots is unreachable (and would break
        # the bucketed gather's static reshape) — same clamp as
        # TrackingPipeline
        self.max_reid_crops = min(self.max_reid_crops, n_det)
        n_crops = self.max_reid_crops
        s = self.n_streams
        use_gmc = self.gmc_method is not None
        if use_gmc:
            from ..ops import gmc as gmc_ops
            gspec = gmc_ops.gmc_spec(self.frame_hw)

        def _split_rest(rest):
            """Trailing per-stream args: [g_a, g_t,] [frame_valid]."""
            if use_gmc:
                f_gmc, rest = (rest[0], rest[1]), rest[2:]
            else:
                f_gmc = None
            return f_gmc, (rest[0] if rest else None)

        def make_per_stream_track(pp):
            def per_stream_track(state, d_xyxy, d_conf, d_cls, d_valid,
                                 feats, crop_valid, *rest):
                f_gmc, frame_valid = _split_rest(rest)
                d_feats = jnp.zeros((n_det, pp.feature_dim), jnp.float32)
                d_feats = d_feats.at[:n_crops].set(feats.astype(jnp.float32))
                d_hasfeat = jnp.zeros((n_det,), jnp.bool_).at[:n_crops].set(
                    crop_valid & d_valid[:n_crops])
                tlwh = jnp.concatenate(
                    [d_xyxy[:, :2], d_xyxy[:, 2:] - d_xyxy[:, :2]], axis=-1)
                dets = Detections(tlwh=tlwh, conf=d_conf, class_id=d_cls,
                                  feature=d_feats, has_feature=d_hasfeat,
                                  valid=d_valid)

                def do(st):
                    st = core_tracker.predict(st, pp)
                    if f_gmc is not None:
                        from ..ops.gmc import warp_xyah_bank
                        m, c = warp_xyah_bank(st.mean, st.cov, f_gmc[0],
                                              f_gmc[1], st.active)
                        st = st.replace(mean=m, cov=c)
                    return core_tracker.update(st, dets, pp)

                if frame_valid is None:
                    state = do(state)
                else:
                    # invalid (stream, t) slots leave that stream's state
                    # untouched (multi-tenant serving: idle streams in a
                    # dispatch must not age their tracks)
                    state = jax.lax.cond(frame_valid, do, lambda st: st,
                                         state)
                return state, core_tracker.get_outputs(state)
            return per_stream_track

        def make_per_stream_track_motion(pp, step_fn, make_dets, get_outs):
            """Per-stream step for the motion-only cores (no features).
            Parameterized by ``pp`` (like make_per_stream_track) so the
            capacity-bucketed scan can rebuild it at a reduced
            ``max_tracks``."""
            def per_stream_track(state, d_xyxy, d_conf, d_cls, d_valid,
                                 *rest):
                f_gmc, frame_valid = _split_rest(rest)
                dets = make_dets(d_xyxy, d_conf, d_cls, d_valid)

                def do(st):
                    return step_fn(st, dets, pp, f_gmc)

                if frame_valid is None:
                    state = do(state)
                else:
                    state = jax.lax.cond(frame_valid, do, lambda st: st,
                                         state)
                return state, get_outs(state, pp)
            return per_stream_track

        if botsort:
            # ByteTrack core + appearance: per-stream features ride the
            # same (feats, crop_valid) args as the DeepSORT path
            def make_track(pp):
                def per_stream_track(state, d_xyxy, d_conf, d_cls, d_valid,
                                     feats, crop_valid, *rest):
                    f_gmc, frame_valid = _split_rest(rest)
                    d_feats = jnp.zeros((n_det, pp.feature_dim),
                                        jnp.float32)
                    d_feats = d_feats.at[:n_crops].set(
                        feats.astype(jnp.float32))
                    d_hasfeat = jnp.zeros((n_det,), jnp.bool_).at[
                        :n_crops].set(crop_valid & d_valid[:n_crops])
                    tlwh = jnp.concatenate(
                        [d_xyxy[:, :2], d_xyxy[:, 2:] - d_xyxy[:, :2]],
                        axis=-1)
                    dets = bt_core.ByteDetections(
                        tlwh=tlwh, score=d_conf, class_id=d_cls,
                        valid=d_valid, feature=d_feats,
                        has_feature=d_hasfeat)

                    def do(st):
                        return bt_core.step(st, dets, pp, f_gmc)

                    if frame_valid is None:
                        state = do(state)
                    else:
                        state = jax.lax.cond(frame_valid, do,
                                             lambda st: st, state)
                    return state, bt_core.get_outputs(state)
                return per_stream_track

            core_params = self.bytetrack_params
        elif bytetrack:
            def _bt_dets(d_xyxy, d_conf, d_cls, d_valid):
                tlwh = jnp.concatenate(
                    [d_xyxy[:, :2], d_xyxy[:, 2:] - d_xyxy[:, :2]], axis=-1)
                return bt_core.ByteDetections(
                    tlwh=tlwh, score=d_conf, class_id=d_cls, valid=d_valid)

            def make_track(pp):
                return make_per_stream_track_motion(
                    pp, bt_core.step, _bt_dets,
                    lambda st, _pp: bt_core.get_outputs(st))

            core_params = self.bytetrack_params
        elif deepocsort:
            # OC-SORT core + appearance (Deep OC-SORT): per-stream features
            # ride the same (feats, crop_valid) args as the DeepSORT path
            def make_track(pp):
                def per_stream_track(state, d_xyxy, d_conf, d_cls, d_valid,
                                     feats, crop_valid, *rest):
                    f_gmc, frame_valid = _split_rest(rest)
                    d_feats = jnp.zeros((n_det, pp.feature_dim),
                                        jnp.float32)
                    d_feats = d_feats.at[:n_crops].set(
                        feats.astype(jnp.float32))
                    d_hasfeat = jnp.zeros((n_det,), jnp.bool_).at[
                        :n_crops].set(crop_valid & d_valid[:n_crops])
                    dets = oc_core.OCSortDetections(
                        xyxy=d_xyxy, score=d_conf, class_id=d_cls,
                        valid=d_valid, feature=d_feats,
                        has_feature=d_hasfeat)

                    def do(st):
                        return oc_core.step(st, dets, pp, f_gmc)

                    if frame_valid is None:
                        state = do(state)
                    else:
                        state = jax.lax.cond(frame_valid, do,
                                             lambda st: st, state)
                    return state, oc_core.get_outputs(state, pp)
                return per_stream_track

            core_params = self.ocsort_params
        elif ocsort:
            def _oc_dets(d_xyxy, d_conf, d_cls, d_valid):
                return oc_core.OCSortDetections(
                    xyxy=d_xyxy, score=d_conf, class_id=d_cls, valid=d_valid)

            def make_track(pp):
                return make_per_stream_track_motion(
                    pp, oc_core.step, _oc_dets, oc_core.get_outputs)

            core_params = self.ocsort_params
        else:
            make_track = make_per_stream_track
            core_params = p
        per_stream_track = make_track(core_params)

        def compact_dets(num, boxes, scores, labels):
            present = jnp.arange(boxes.shape[0]) < num
            det_valid = present & (scores >= self.conf_threshold)
            trackable = jnp.any(
                labels[:, None] == self._track_class_ids[None, :], axis=1)
            if bytetrack:
                elig = present & trackable & \
                    (scores > self.bytetrack_params.low_thresh)
            elif ocsort:
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
                    compact(labels.astype(jnp.int32)), compact(elig))

        def detect_and_embed(yolo_params, reid_params, frames):
            """Detect + compact + ReID for a flat batch of frames (B, ...)."""
            b_total = frames.shape[0]
            x = jax.vmap(
                lambda f: self._preprocess(f, spec, out_dtype=self._dtype)[0]
            )(frames)
            levels = self.yolo.apply(yolo_params, x)
            num, nboxes, nscores, nlabels = fused_decode_nms(
                levels,
                score_threshold=self._nms_score_floor,
                iou_threshold=self.nms_threshold,
                top_k=config.YOLO_NMS_TOPK,
                max_det=config.YOLO_MAX_DETECTIONS)
            boxes_f = jax.vmap(lambda bx: scale_boxes_back(bx, spec))(nboxes)
            d_xyxy, d_conf, d_cls, d_valid = jax.vmap(compact_dets)(
                num, boxes_f, nscores, nlabels)

            if not with_reid:
                # motion-only cores: no crop/embed stage in the program
                return d_xyxy, d_conf, d_cls, d_valid

            # load-adaptive crop bucketing (see runtime/pipeline.py): embed
            # only as many crop slots as the busiest frame needs. NOTE: with
            # a sharded mesh this reduces compute uniformly across chips
            # (the bucket index is a replicated scalar).
            buckets = [b for b in (4, 8, 12, 16, 24)
                       if b < n_crops] + [n_crops]
            n_needed = jnp.max(jnp.sum(d_valid[:, :n_crops], axis=1))

            def make_branch(b):
                def branch(_):
                    crops, crop_valid = jax.vmap(
                        lambda fr, bx: extract_reid_crops(
                            fr, bx, out_hw=config.REID_INPUT_SHAPE)
                    )(frames, d_xyxy[:, :b])
                    f = self.reid.apply(
                        reid_params,
                        crops.reshape(b_total * b, *crops.shape[2:]))
                    f = f.reshape(b_total, b, -1)
                    fpad = jnp.zeros((b_total, n_crops, f.shape[-1]),
                                     f.dtype).at[:, :b].set(f)
                    vpad = jnp.zeros((b_total, n_crops), jnp.bool_).at[
                        :, :b].set(crop_valid)
                    return fpad, vpad
                return branch

            idx = sum(jnp.int32(n_needed > b) for b in buckets[:-1])
            feats, crop_valid = jax.lax.switch(
                idx, [make_branch(b) for b in buckets], operand=None)
            return d_xyxy, d_conf, d_cls, d_valid, feats, crop_valid

        def stream_gmc(prev_frames, frames_sk):
            """Per-stream camera motion: (S,H,W,3), (S,K,...) ->
            (S,K,2,2), (S,K,2). vmapped over streams — stream-local."""
            from ..ops import gmc as gmc_ops
            return jax.vmap(lambda pf, fs: gmc_ops.estimate_chunk(
                pf, fs, gspec, self.gmc_method))(prev_frames, frames_sk)

        def step(yolo_params, reid_params, states, frames,
                 prev_frames=None):
            # frames: (S, H, W, 3) uint8 — one frame per stream per step
            dets = detect_and_embed(yolo_params, reid_params, frames)
            extra = ()
            if use_gmc:
                prev = frames if prev_frames is None else prev_frames
                g_a, g_t = stream_gmc(prev, frames[:, None])
                extra = (g_a[:, 0], g_t[:, 0])
            states, outs = jax.vmap(per_stream_track)(states, *dets, *extra)
            return states, outs

        def chunk_step(yolo_params, reid_params, states, frames,
                       frame_valid=None, prev_frames=None):
            # frames: (S, K, H, W, 3) — K frames per stream per dispatch.
            # All S*K frames ride one detection/ReID batch; the per-stream
            # tracker scans over time inside the same program.
            # frame_valid (S, K) bool, optional: slots marked False leave
            # their stream's state untouched (their outputs are garbage to
            # be masked host-side) — the multi-tenant serving path.
            s_, k_ = frames.shape[:2]
            flat = frames.reshape(s_ * k_, *frames.shape[2:])
            dets = detect_and_embed(yolo_params, reid_params, flat)
            # (S*K, ...) -> (K, S, ...) for the time scan
            dets = jax.tree.map(
                lambda a: a.reshape(s_, k_, *a.shape[1:]).swapaxes(0, 1),
                tuple(dets))
            if use_gmc:
                prev = frames[:, 0] if prev_frames is None else prev_frames
                g_a, g_t = stream_gmc(prev, frames)
                dets = dets + (g_a.swapaxes(0, 1), g_t.swapaxes(0, 1))
            if frame_valid is not None:
                dets = dets + (frame_valid.swapaxes(0, 1),)

            def make_body(pp):
                track = make_track(pp)

                def body(st, per_t):
                    return jax.vmap(track)(st, *per_t)
                return body

            t_small = self.scan_bucket
            if t_small and t_small < core_params.max_tracks:
                # capacity-bucketed time scan (see runtime/pipeline.py):
                # the fits/overflow conds are SCALAR (reduced over all
                # streams), evaluated outside the vmap — so exactly one
                # scan variant executes per chunk, unlike a per-stream
                # cond which vmap would run both branches of
                import dataclasses as _dc
                from ..core.state import (slice_stream_tracks,
                                          splice_stream_tracks)
                p_small = _dc.replace(core_params, max_tracks=t_small)
                t_full = core_params.max_tracks
                k_ = dets[0].shape[0]

                def pad_outs(outs):
                    pad_t = t_full - t_small
                    return tuple(
                        jnp.pad(a, ((0, 0), (0, 0), (0, pad_t)) +
                                ((0, 0),) * (a.ndim - 3)) for a in outs)

                def zero_outs():
                    tlbr_z = jnp.zeros((k_, s, t_full, 4), jnp.float32)
                    i_z = jnp.zeros((k_, s, t_full), jnp.int32)
                    return (tlbr_z, i_z, i_z, tlbr_z[..., 0],
                            jnp.zeros((k_, s, t_full), jnp.bool_))

                def small_pass(_):
                    small = slice_stream_tracks(states, t_small)
                    s_small, outs = jax.lax.scan(
                        make_body(p_small), small, dets)
                    return (splice_stream_tracks(states, s_small),
                            pad_outs(outs), jnp.sum(s_small.dropped))

                def skip_small(_):
                    return (states, zero_outs(),
                            jnp.sum(states.dropped) + 1)

                # headroom guard against overflow thrash near the boundary
                # (see runtime/pipeline.py); every stream needs slack
                headroom = max(4, t_small // 4)
                fits = (~jnp.any(states.active[:, t_small:]) &
                        (jnp.max(jnp.sum(states.active, axis=1))
                         <= t_small - headroom))
                cand_states, cand_outs, cand_dropped = jax.lax.cond(
                    fits, small_pass, skip_small, None)
                use_full = cand_dropped > jnp.sum(states.dropped)

                def full_pass(_):
                    return jax.lax.scan(make_body(core_params), states, dets)

                def accept(_):
                    return cand_states, cand_outs

                states, outs = jax.lax.cond(
                    use_full, full_pass, accept, None)
            else:
                states, outs = jax.lax.scan(
                    make_body(core_params), states, dets)
            # outs: each (K, S, ...) -> (S, K, ...)
            outs = jax.tree.map(lambda a: a.swapaxes(0, 1), outs)
            return states, outs

        def jit_with_shardings(fn, n_extra_stream_args=0):
            if self.mesh is not None:
                in_shardings = (
                    # actual placements (channel-sharded under a 2-D mesh)
                    jax.tree.map(lambda x: x.sharding, self.yolo_params),
                    jax.tree.map(lambda x: x.sharding, self.reid_params),
                    jax.tree.map(
                        lambda _: NamedSharding(self.mesh, P("stream")),
                        self.states),
                    self._frames_sharding,
                ) + (self._frames_sharding,) * n_extra_stream_args
                return jax.jit(fn, in_shardings=in_shardings,
                               donate_argnums=(2,))
            return jax.jit(fn, donate_argnums=(2,))

        self._jit_with_shardings = jit_with_shardings
        self._chunk_step_raw = chunk_step
        self._chunk_step_masked = None  # compiled on first masked use
        if use_gmc:
            # positional variants so every compiled signature stays
            # keyword-free (in_shardings maps positional args only) and
            # the unmasked path keeps its cond-free scan body
            def step_g(y, r, st, frames, prev):
                return step(y, r, st, frames, prev_frames=prev)

            def chunk_g(y, r, st, frames, prev):
                return chunk_step(y, r, st, frames, prev_frames=prev)

            def chunk_g_masked(y, r, st, frames, fv, prev):
                return chunk_step(y, r, st, frames, fv, prev)

            self._chunk_step_raw = chunk_g_masked
            self._masked_extra = 2  # frame_valid + prev_frames
            return (jit_with_shardings(step_g, 1),
                    jit_with_shardings(chunk_g, 1))
        self._masked_extra = 1
        return jit_with_shardings(step), jit_with_shardings(chunk_step)

    def step(self, frames: np.ndarray):
        """Advance all streams by one frame each.

        Args:
            frames: ``(S, H, W, 3)`` uint8 BGR — one frame per stream.

        Returns:
            per-stream track outputs (tlbr, ids, cls, conf, mask), each with
            a leading stream axis (device arrays, async).
        """
        frames_np = np.asarray(frames)
        frames = jnp.asarray(frames_np)
        if self._frames_sharding is not None:
            frames = jax.device_put(frames, self._frames_sharding)
        if self.gmc_method is not None:
            prev_np = (self._gmc_prev if self._gmc_prev is not None
                       else frames_np)
            prev = jnp.asarray(prev_np)
            if self._frames_sharding is not None:
                prev = jax.device_put(prev, self._frames_sharding)
            self._gmc_prev = frames_np.copy()
            self.states, outs = self._step(
                self.yolo_params, self.reid_params, self.states, frames,
                prev)
            return outs
        self.states, outs = self._step(
            self.yolo_params, self.reid_params, self.states, frames)
        return outs

    def step_chunk(self, frames: np.ndarray,
                   frame_valid: np.ndarray | None = None):
        """Advance all streams by K frames each (throughput mode).

        Args:
            frames: ``(S, K, H, W, 3)`` uint8 BGR.
            frame_valid: optional ``(S, K)`` bool — False slots do not
                advance their stream's tracker state (their output lanes
                are garbage the caller must ignore). Used by the
                multi-tenant service when streams produce frames at
                different rates.

        Returns:
            per-stream track outputs, each with shape ``(S, K, ...)``.
        """
        frames_np = np.asarray(frames)
        frames = jnp.asarray(frames_np)
        if self._frames_sharding is not None:
            frames = jax.device_put(frames, self._frames_sharding)
        extra = ()
        if self.gmc_method is not None:
            prev_np = (self._gmc_prev if self._gmc_prev is not None
                       else frames_np[:, 0])
            prev = jnp.asarray(prev_np)
            if self._frames_sharding is not None:
                prev = jax.device_put(prev, self._frames_sharding)
            extra = (prev,)
            # carry each stream's last VALID frame into the next dispatch
            if frame_valid is None:
                self._gmc_prev = frames_np[:, -1].copy()
            else:
                fv_np = np.asarray(frame_valid, bool)
                nxt = (self._gmc_prev.copy()
                       if self._gmc_prev is not None else prev_np.copy())
                for si in range(fv_np.shape[0]):
                    idx = np.flatnonzero(fv_np[si])
                    if len(idx):
                        nxt[si] = frames_np[si, idx[-1]]
                self._gmc_prev = nxt
        if frame_valid is None:
            self.states, outs = self._chunk_step(
                self.yolo_params, self.reid_params, self.states, frames,
                *extra)
            return outs
        if self._chunk_step_masked is None:
            self._chunk_step_masked = self._jit_with_shardings(
                self._chunk_step_raw,
                n_extra_stream_args=self._masked_extra)
        fv = jnp.asarray(frame_valid, bool)
        if self._frames_sharding is not None:
            fv = jax.device_put(fv, self._frames_sharding)
        self.states, outs = self._chunk_step_masked(
            self.yolo_params, self.reid_params, self.states, frames, fv,
            *extra)
        return outs

    def reset_stream(self, i: int):
        """Reset one stream's tracker state in place (ids restart at 1).

        Host-side slice update — only call between dispatches (the serving
        worker does this when a stream slot is re-leased to a new tenant).
        """
        fresh = self._init_one_state()
        self.states = jax.tree.map(
            lambda full, f: full.at[i].set(f.astype(full.dtype)),
            self.states, fresh)
