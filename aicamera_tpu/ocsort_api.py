"""OC-SORT facade: the DeepSORT facade's call contract, observation-centric
motion tracking inside.

The reference lists OC-SORT integration as a future enhancement
(reference README.md, Future Enhancements). This facade exposes the
TPU-native OC-SORT core (:mod:`.core.ocsort`) behind the same
``update(bboxes, confs, class_ids, frame) -> [(x1, y1, x2, y2, track_id,
class_name, conf)]`` contract as :class:`~aicamera_tpu.tracker_api.DeepSORT`:

- **No ReID model.** Association is IoU + velocity-direction consistency
  (OCM); lost tracks recover by their last observation box (OCR) and the
  Kalman state re-updates along the virtual trajectory on recovery (ORU).
  The ``frame`` argument is accepted for contract parity and ignored.
- **Observation-centric outputs.** Emitted boxes are the matched
  detections, not filtered states, and appear only once a track has
  ``min_hits`` consecutive hits (except during the first frames).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np

from . import config
from .core import ocsort as oc
from .runtime.engine import enable_persistent_cache


class OCSort:
    """High-level OC-SORT facade (official OCSort semantics)."""

    def __init__(self,
                 det_thresh: float = 0.6,
                 max_age: int = 30,
                 min_hits: int = 3,
                 iou_threshold: float = 0.3,
                 delta_t: int = 3,
                 inertia: float = 0.2,
                 max_tracks: int = config.MAX_TRACKS,
                 max_detections: int = config.MAX_DETECTIONS,
                 gmc: str | bool = False):
        """``gmc``: camera-motion compensation (``"affine"``/``True`` or
        ``"translation"``; :mod:`.ops.gmc`) — warps the Kalman bank AND
        OC-SORT's observation history each frame. Requires the frame
        argument on every :meth:`update`."""
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
        )
        self.state = oc.init_state(self.params)
        self.frame_count = 0
        self._dropped_host = 0
        self._warned_capacity = False
        print("OC-SORT Tracker initialized (TPU/XLA).")
        print(f"  Params: DetThresh={det_thresh}, IoUThresh={iou_threshold}, "
              f"MaxAge={max_age}, MinHits={min_hits}, DeltaT={delta_t}, "
              f"Inertia={inertia}")

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

    def update(self,
               yolo_bboxes_xyxy: np.ndarray,
               yolo_confidences: np.ndarray,
               yolo_class_ids: np.ndarray,
               original_frame_bgr: np.ndarray | None = None
               ) -> List[Tuple[int, int, int, int, int, str, float]]:
        """Process one frame's detections; returns emitted tracks.

        Same call/return contract as DeepSORT.update; ``original_frame_bgr``
        is unused (no appearance model) and may be None.
        """
        self.frame_count += 1
        p = self.params
        n_det = p.max_detections

        boxes = np.asarray(yolo_bboxes_xyxy, np.float32).reshape(-1, 4)
        confs = np.asarray(yolo_confidences, np.float32).reshape(-1)
        clss = np.asarray(yolo_class_ids).reshape(-1).astype(np.int32)

        # class filter (same set as DeepSORT) + the strict det_thresh floor
        # (a box at or below it is invisible to OC-SORT), in float32 so the
        # host prefilter agrees bitwise with the device step's own gate.
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
                    "the extras. Raise max_detections for crowded scenes; "
                    "see .dropped_detections. (warned once)", stacklevel=2)
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

        g = None
        if self._gmc is not None:
            if original_frame_bgr is None:
                raise ValueError("gmc is enabled: update() needs the frame")
            g = self._gmc.step(original_frame_bgr)
        import jax.numpy as jnp
        dets = oc.OCSortDetections(
            xyxy=jnp.asarray(d_xyxy), score=jnp.asarray(d_conf),
            class_id=jnp.asarray(d_cls), valid=jnp.asarray(d_valid))
        self.state = oc.step(self.state, dets, p, gmc=g)
        box, ids, cls_ids, scores, mask = jax.device_get(
            oc.get_outputs(self.state, p))

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
        import jax.numpy as jnp
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
    print("--- OC-SORT facade smoke test ---")
    tr = OCSort(min_hits=2)
    box = np.array([[50.0, 100.0, 150.0, 200.0]], np.float32)

    out1 = tr.update(box, np.array([0.9]), np.array([0]), None)
    assert len(out1) == 1 and out1[0][4] == 1, \
        "first frames emit immediately (frame_count <= min_hits)"
    out2 = tr.update(box + 4, np.array([0.9]), np.array([0]), None)
    assert len(out2) == 1 and out2[0][4] == 1
    out3 = tr.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), None)
    assert out3 == [], "missed frame emits nothing"
    out4 = tr.update(box + 12, np.array([0.9]), np.array([0]), None)
    assert all(t[4] == 1 for t in out4), "recovery keeps the id (OCR/ORU)"
    print("--- PASSED ---")
