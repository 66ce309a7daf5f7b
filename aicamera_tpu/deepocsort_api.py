"""Deep OC-SORT facade: OC-SORT's observation-centric motion tracking
fused with adaptively-weighted ReID appearance.

Deep OC-SORT (Maggiolino et al., ICIP 2023, arXiv:2302.11813) = OC-SORT +
three appearance upgrades: camera-motion compensation, a per-track
EMA-smoothed ReID embedding updated with a confidence-modulated
("dynamic") alpha, and an adaptively weighted cosine-similarity term in
the first association round (the weight grows with how discriminative the
similarity is for that row/column — the official compute_aw_max_metric).
The reference lists tracker-algorithm integration on its
future-enhancements list (reference README.md); this facade exposes the
appearance mode of the TPU-native OC-SORT core (:mod:`.core.ocsort`,
``OCSortParams(with_appearance=True)``) behind the same ``update(bboxes,
confs, class_ids, frame)`` contract as
:class:`~aicamera_tpu.tracker_api.DeepSORT` (reference
deepsort_tracker.py:63-141).

Like the DeepSORT and BoT-SORT facades, the per-frame step is ONE jitted
device program: crop gather from the full frame, batched ReID forward,
fused association, KF bank update. Add ``gmc="affine"`` for the paper's
full stack (appearance + CMC).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .core import ocsort as oc
from .ops.crops import extract_reid_crops
from .runtime.engine import enable_persistent_cache
from .tracker_api import ReIDModel


class DeepOCSort:
    """High-level Deep OC-SORT facade (official defaults: w_assoc_emb
    0.75, aw_param 0.5, alpha_fixed_emb 0.95)."""

    def __init__(self,
                 reid_model_path: str | None = None,
                 reid_input_shape: Tuple[int, int] = config.REID_INPUT_SHAPE,
                 det_thresh: float = 0.6,
                 max_age: int = 30,
                 min_hits: int = 3,
                 iou_threshold: float = 0.3,
                 delta_t: int = 3,
                 inertia: float = 0.2,
                 w_assoc_emb: float = 0.75,
                 aw_param: float = 0.5,
                 alpha_fixed_emb: float = 0.95,
                 max_tracks: int = config.MAX_TRACKS,
                 max_detections: int = config.MAX_DETECTIONS,
                 max_reid_crops: int = config.MAX_REID_CROPS,
                 gmc: str | bool = False):
        enable_persistent_cache()
        self._gmc = None
        if gmc not in (False, None, "off", "none", ""):
            from .ops.gmc import GMCEstimator
            self._gmc = GMCEstimator("affine" if gmc is True else str(gmc))
        self.params = oc.OCSortParams(
            det_thresh=float(det_thresh),
            max_age=int(max_age),
            min_hits=int(min_hits),
            iou_threshold=float(iou_threshold),
            delta_t=int(delta_t),
            inertia=float(inertia),
            max_tracks=int(max_tracks),
            max_detections=int(max_detections),
            with_appearance=True,
            feature_dim=config.REID_FEATURE_DIM,
            alpha_fixed_emb=float(alpha_fixed_emb),
            w_assoc_emb=float(w_assoc_emb),
            aw_param=float(aw_param),
        )
        self.max_reid_crops = min(int(max_reid_crops), int(max_detections))
        self.reid_model = ReIDModel(engine_path=reid_model_path,
                                    input_shape=reid_input_shape)
        self.state = oc.init_state(self.params)
        self.frame_count = 0
        self._dropped_host = 0
        self._warned_capacity = False
        self._steps = {}
        print("Deep OC-SORT Tracker initialized (TPU/XLA).")
        print(f"  Params: DetThresh={det_thresh}, IoUThresh={iou_threshold}, "
              f"WAssocEmb={w_assoc_emb}, AwParam={aw_param}, "
              f"AlphaFixedEmb={alpha_fixed_emb}")

    def reset(self):
        self.state = oc.init_state(self.params)
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
            dets = oc.OCSortDetections(
                xyxy=d_xyxy, score=d_conf, class_id=d_cls, valid=d_valid,
                feature=d_feats, has_feature=d_hasfeat)
            state = oc.step(state, dets, p, gmc=gmc if use_gmc else None)
            return state, oc.get_outputs(state, p)

        self._steps[key] = jax.jit(step, donate_argnums=(1,))
        return self._steps[key]

    def update(self,
               yolo_bboxes_xyxy: np.ndarray,
               yolo_confidences: np.ndarray,
               yolo_class_ids: np.ndarray,
               original_frame_bgr: np.ndarray
               ) -> List[Tuple[int, int, int, int, int, str, float]]:
        """Process one frame's detections; returns emitted tracks.

        Same call/return contract as DeepSORT.update; the frame feeds the
        on-device ReID crop gather (and GMC when enabled).
        """
        self.frame_count += 1
        p = self.params
        n_det = p.max_detections

        boxes = np.asarray(yolo_bboxes_xyxy, np.float32).reshape(-1, 4)
        confs = np.asarray(yolo_confidences, np.float32).reshape(-1)
        clss = np.asarray(yolo_class_ids).reshape(-1).astype(np.int32)

        # class filter + the strict det_thresh floor (see ocsort_api)
        thr = np.float32(p.det_thresh)
        keep = []
        for i in range(len(boxes)):
            cid = int(clss[i])
            name = config.CLASSES[cid] if 0 <= cid < len(config.CLASSES) \
                else "Unknown"
            if confs[i] > thr and name in config.CLASSES_TO_TRACK:
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
        box, ids, cls_ids, scores, mask = jax.device_get(outs)

        out = []
        for b, i, c, s in zip(box[mask], ids[mask], cls_ids[mask],
                              scores[mask]):
            name = config.CLASSES[int(c)] if 0 <= int(c) < len(config.CLASSES) \
                else "Unknown"
            out.append((int(round(float(b[0]))), int(round(float(b[1]))),
                        int(round(float(b[2]))), int(round(float(b[3]))),
                        int(i), name, float(s)))
        return out

    def get_active_tracks(self):
        """All live tracks as (x1, y1, x2, y2, track_id, class_name, conf,
        time_since_update) tuples (KF-state boxes for coasting tracks)."""
        st = self.state
        kf_boxes = np.asarray(oc.x_to_xyxy(jnp.asarray(st.x)))
        last = np.asarray(st.last_obs)
        active = np.asarray(st.active)
        out = []
        for i in np.flatnonzero(active):
            b = last[i, :4] if last[i, 4] >= 0 else kf_boxes[i]
            cid = int(np.asarray(st.class_id)[i])
            name = config.CLASSES[cid] if 0 <= cid < len(config.CLASSES) \
                else "Unknown"
            out.append((int(round(float(b[0]))), int(round(float(b[1]))),
                        int(round(float(b[2]))), int(round(float(b[3]))),
                        int(np.asarray(st.track_id)[i]), name,
                        float(np.asarray(st.score)[i]),
                        int(np.asarray(st.tsu)[i])))
        return out


if __name__ == "__main__":
    # inline lifecycle smoke test, reference-style
    print("--- Deep OC-SORT facade smoke test ---")
    tr = DeepOCSort(min_hits=2)
    frame = np.zeros((240, 320, 3), np.uint8)
    frame[100:200, 50:150] = 128
    box = np.array([[50.0, 100.0, 150.0, 200.0]], np.float32)

    out1 = tr.update(box, np.array([0.9]), np.array([0]), frame)
    assert len(out1) == 1 and out1[0][4] == 1
    out2 = tr.update(box + 4, np.array([0.9]), np.array([0]), frame)
    assert len(out2) == 1 and out2[0][4] == 1
    out3 = tr.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), frame)
    assert out3 == []
    out4 = tr.update(box + 12, np.array([0.9]), np.array([0]), frame)
    assert all(t[4] == 1 for t in out4), "recovery keeps the id"
    print("--- PASSED ---")
