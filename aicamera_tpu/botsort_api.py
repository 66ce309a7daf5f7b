"""BoT-SORT facade: ByteTrack's two-pass association fused with ReID.

BoT-SORT (Aharon et al. 2022, arXiv:2206.14651) = ByteTrack + appearance:
stage-1/3 costs are ``min(iou, emb)`` with proximity/appearance masking and
each track keeps an EMA-smoothed ReID embedding. The reference lists
tracker-algorithm integration on its future-enhancements list (reference
README.md); this facade exposes the appearance mode of the TPU-native
ByteTrack core (:mod:`.core.bytetrack`) behind the same ``update(bboxes,
confs, class_ids, frame)`` contract as :class:`~aicamera_tpu.tracker_api.
DeepSORT` (reference deepsort_tracker.py:63-141).

Like DeepSORT here, the per-frame step is ONE jitted device program: crop
gather from the full frame, batched ReID forward, fused association, KF
bank update. Add ``gmc="affine"`` for the full BoT-SORT stack (the paper's
pipeline is exactly appearance fusion + camera-motion compensation).

Feed it low-score detections (``conf_threshold <= low_thresh``), same as
ByteTrack — the second association stage is the point of BYTE.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .core import bytetrack as bt
from .ops.crops import extract_reid_crops
from .runtime.engine import enable_persistent_cache
from .tracker_api import ReIDModel


class BoTSORT:
    """High-level BoT-SORT facade (official BoTSORT association semantics;
    motion model = this package's xyah Kalman bank, see core docstring)."""

    def __init__(self,
                 reid_model_path: str | None = None,
                 reid_input_shape: Tuple[int, int] = config.REID_INPUT_SHAPE,
                 track_thresh: float = 0.5,
                 match_thresh: float = 0.8,
                 track_buffer: int = 30,
                 frame_rate: int = 30,
                 fuse_score: bool = True,
                 proximity_thresh: float = 0.5,
                 appearance_thresh: float = 0.25,
                 feat_ema_alpha: float = 0.9,
                 max_tracks: int = config.MAX_TRACKS,
                 max_detections: int = config.MAX_DETECTIONS,
                 max_reid_crops: int = config.MAX_REID_CROPS,
                 gmc: str | bool = False):
        enable_persistent_cache()
        self._gmc = None
        if gmc not in (False, None, "off", "none", ""):
            from .ops.gmc import GMCEstimator
            self._gmc = GMCEstimator("affine" if gmc is True else str(gmc))
        self.params = bt.ByteTrackParams(
            track_thresh=float(track_thresh),
            match_thresh=float(match_thresh),
            max_time_lost=int(frame_rate / 30.0 * track_buffer),
            fuse_score=bool(fuse_score),
            max_tracks=int(max_tracks),
            max_detections=int(max_detections),
            with_appearance=True,
            proximity_thresh=float(proximity_thresh),
            appearance_thresh=float(appearance_thresh),
            feat_ema_alpha=float(feat_ema_alpha),
            feature_dim=config.REID_FEATURE_DIM,
        )
        self.max_reid_crops = min(int(max_reid_crops), int(max_detections))
        self.reid_model = ReIDModel(engine_path=reid_model_path,
                                    input_shape=reid_input_shape)
        self.state = bt.init_state(self.params)
        self.frame_count = 0
        self._dropped_host = 0
        self._warned_capacity = False
        self._steps = {}
        print("BoT-SORT Tracker initialized (TPU/XLA).")
        print(f"  Params: TrackThresh={track_thresh}, "
              f"MatchThresh={match_thresh}, "
              f"AppearanceThresh={appearance_thresh}, "
              f"MaxTimeLost={self.params.max_time_lost}")

    def reset(self):
        self.state = bt.init_state(self.params)
        self.frame_count = 0
        self._dropped_host = 0
        if self._gmc is not None:
            self._gmc.reset()

    @property
    def dropped_detections(self) -> int:
        """Detections dropped to the fixed capacities (host + device)."""
        return self._dropped_host + int(np.asarray(self.state.dropped))

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
            dets = bt.ByteDetections(
                tlwh=tlwh, score=d_conf, class_id=d_cls, valid=d_valid,
                feature=d_feats, has_feature=d_hasfeat)
            state = bt.step(state, dets, p,
                            gmc=gmc if use_gmc else None)
            return state, bt.get_outputs(state)

        self._steps[key] = jax.jit(step, donate_argnums=(1,))
        return self._steps[key]

    def update(self,
               yolo_bboxes_xyxy: np.ndarray,
               yolo_confidences: np.ndarray,
               yolo_class_ids: np.ndarray,
               original_frame_bgr: np.ndarray
               ) -> List[Tuple[int, int, int, int, int, str, float]]:
        """Process one frame's detections; returns activated tracked tracks.

        Same call/return contract as DeepSORT.update; the frame feeds the
        on-device ReID crop gather (and GMC when enabled).
        """
        self.frame_count += 1
        p = self.params
        n_det = p.max_detections

        boxes = np.asarray(yolo_bboxes_xyxy, np.float32).reshape(-1, 4)
        confs = np.asarray(yolo_confidences, np.float32).reshape(-1)
        clss = np.asarray(yolo_class_ids).reshape(-1).astype(np.int32)

        # class filter + low-score floor (see bytetrack_api for rationale)
        low = np.float32(p.low_thresh)
        keep = []
        for i in range(len(boxes)):
            cid = int(clss[i])
            name = config.CLASSES[cid] if 0 <= cid < len(config.CLASSES) \
                else "Unknown"
            if confs[i] > low and name in config.CLASSES_TO_TRACK:
                keep.append(i)
        if len(keep) > n_det:
            self._dropped_host += len(keep) - n_det
            if not self._warned_capacity:
                import warnings
                warnings.warn(
                    f"frame {self.frame_count}: {len(keep)} filtered "
                    f"detections exceed max_detections={n_det}; dropping "
                    f"the extras (and only the first {self.max_reid_crops} "
                    "get appearance features). Raise max_detections/"
                    "max_reid_crops for crowded scenes; see "
                    ".dropped_detections. (warned once)", stacklevel=2)
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
        tlbr, ids, cls_ids, scores, mask = jax.device_get(outs)

        out = []
        for b, i, c, s in zip(tlbr[mask], ids[mask], cls_ids[mask],
                              scores[mask]):
            name = config.CLASSES[int(c)] if 0 <= int(c) < len(config.CLASSES) \
                else "Unknown"
            out.append((int(round(float(b[0]))), int(round(float(b[1]))),
                        int(round(float(b[2]))), int(round(float(b[3]))),
                        int(i), name, float(s)))
        return out

    def get_active_tracks(self):
        """All live tracks (tracked AND lost) as (x1, y1, x2, y2, track_id,
        class_name, conf, time_since_update) tuples."""
        from .core.costs import mean_to_tlwh, tlwh_to_tlbr
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
                        float(np.asarray(st.score)[i]),
                        int(np.asarray(st.tsu)[i])))
        return out
