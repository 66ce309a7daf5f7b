"""ByteTrack facade: the DeepSORT facade's call contract, motion-only inside.

The reference lists ByteTrack integration as a future enhancement
(reference README.md, Future Enhancements). This facade exposes the
TPU-native ByteTrack core (:mod:`.core.bytetrack`) behind the same
``update(bboxes, confs, class_ids, frame) -> [(x1, y1, x2, y2, track_id,
class_name, conf)]`` contract as :class:`~aicamera_tpu.tracker_api.DeepSORT`
(reference deepsort_tracker.py:63-141), so it is a drop-in tracker swap:

- **No ReID model.** Association is Kalman-predicted IoU only; the
  ``frame`` argument is accepted for contract parity and ignored.
- **Feed it low-score detections.** ByteTrack's second association stage
  recovers occluded objects from the low-score boxes (``low_thresh <
  score < track_thresh``) that confidence-threshold pipelines discard —
  run the detector with ``conf_threshold <= low_thresh`` (0.1) for the
  algorithm to see them. The facade prefilters only by tracked class and
  ``score > low_thresh`` (anything at or below can never match or start
  a track).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .core import bytetrack as bt
from .runtime.engine import enable_persistent_cache


class ByteTrack:
    """High-level ByteTrack facade (official BYTETracker semantics)."""

    def __init__(self,
                 track_thresh: float = 0.5,
                 match_thresh: float = 0.8,
                 track_buffer: int = 30,
                 frame_rate: int = 30,
                 fuse_score: bool = True,
                 max_tracks: int = config.MAX_TRACKS,
                 max_detections: int = config.MAX_DETECTIONS,
                 gmc: str | bool = False):
        """``track_buffer`` scales with ``frame_rate`` exactly like the
        official tracker: ``max_time_lost = frame_rate / 30 * track_buffer``.

        ``gmc``: camera-motion compensation (``"affine"``/``True`` or
        ``"translation"``; :mod:`.ops.gmc`). ByteTrack + GMC is exactly
        BoT-SORT's compensated motion model. Requires the frame argument
        on every :meth:`update`.
        """
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
        )
        self.state = bt.init_state(self.params)
        self.frame_count = 0
        self._dropped_host = 0
        self._warned_capacity = False
        print("ByteTrack Tracker initialized (TPU/XLA).")
        print(f"  Params: TrackThresh={track_thresh}, "
              f"MatchThresh={match_thresh}, MaxTimeLost="
              f"{self.params.max_time_lost}")

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

    def update(self,
               yolo_bboxes_xyxy: np.ndarray,
               yolo_confidences: np.ndarray,
               yolo_class_ids: np.ndarray,
               original_frame_bgr: np.ndarray | None = None
               ) -> List[Tuple[int, int, int, int, int, str, float]]:
        """Process one frame's detections; returns activated tracked tracks.

        Same call/return contract as DeepSORT.update; ``original_frame_bgr``
        is unused (no appearance model) and may be None.
        """
        self.frame_count += 1
        p = self.params
        n_det = p.max_detections

        boxes = np.asarray(yolo_bboxes_xyxy, np.float32).reshape(-1, 4)
        confs = np.asarray(yolo_confidences, np.float32).reshape(-1)
        clss = np.asarray(yolo_class_ids).reshape(-1).astype(np.int32)

        # class filter (same set as DeepSORT) + low-score floor: a box at or
        # below low_thresh is invisible to every ByteTrack stage. Compare in
        # float32 so the host prefilter agrees bitwise with the device
        # step's own score split.
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
                    "the extras. Raise max_detections for crowded scenes; "
                    "see .dropped_detections. (warned once)", stacklevel=2)
                self._warned_capacity = True
        keep = keep[:n_det]

        d_tlwh = np.zeros((n_det, 4), np.float32)
        d_conf = np.zeros((n_det,), np.float32)
        d_cls = np.zeros((n_det,), np.int32)
        d_valid = np.zeros((n_det,), bool)
        k = len(keep)
        if k:
            b = boxes[keep]
            d_tlwh[:k, :2] = b[:, :2]
            d_tlwh[:k, 2:] = b[:, 2:] - b[:, :2]
            d_conf[:k] = confs[keep]
            d_cls[:k] = clss[keep]
            d_valid[:k] = True

        g = None
        if self._gmc is not None:
            if original_frame_bgr is None:
                raise ValueError("gmc is enabled: update() needs the frame")
            g = self._gmc.step(original_frame_bgr)
        dets = bt.ByteDetections(
            tlwh=jnp.asarray(d_tlwh), score=jnp.asarray(d_conf),
            class_id=jnp.asarray(d_cls), valid=jnp.asarray(d_valid))
        self.state = bt.step(self.state, dets, p, gmc=g)
        tlbr, ids, cls_ids, scores, mask = jax.device_get(
            bt.get_outputs(self.state))

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


if __name__ == "__main__":
    # inline lifecycle smoke test, reference-style
    print("--- ByteTrack facade smoke test ---")
    tr = ByteTrack()
    box = np.array([[50.0, 100.0, 150.0, 200.0]], np.float32)

    out1 = tr.update(box, np.array([0.9]), np.array([0]), None)
    assert len(out1) == 1 and out1[0][4] == 1, \
        "frame-1 tracks activate immediately"
    out2 = tr.update(box + 3, np.array([0.3]), np.array([0]), None)
    assert len(out2) == 1 and out2[0][4] == 1, \
        "low-score detection keeps the track alive (BYTE second stage)"
    out3 = tr.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), None)
    assert out3 == [], "missed frame emits nothing (track lost)"
    out4 = tr.update(box + 9, np.array([0.95]), np.array([0]), None)
    assert len(out4) == 1 and out4[0][4] == 1, "same id after a miss"
    print("--- PASSED ---")
