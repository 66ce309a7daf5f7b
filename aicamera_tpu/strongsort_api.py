"""StrongSORT facade: DeepSORT with every StrongSORT upgrade pre-wired.

StrongSORT (Du et al. 2023, arXiv:2202.13514) revisits DeepSORT and
upgrades four pieces while keeping the association skeleton:

- **EMA appearance bank** (paper eq. 6-7): one exponential-moving-average
  embedding per track instead of the raw feature ring
  (``gallery_strategy="ema"``, :mod:`.core.tracker`).
- **NSA Kalman update** (paper eq. 8): each matched correction scales its
  measurement noise by ``(1 - detection confidence)``
  (``nsa=True``, :func:`.core.kalman.project`).
- **Camera-motion compensation** (the paper uses ECC; here the TPU-native
  block-phase-correlation affine of :mod:`.ops.gmc`) — ``gmc="affine"``.
- **GSI** — Gaussian-smoothed interpolation — is the paper's *offline*
  post-processing stage; it operates on finished track records, not the
  online state, so it lives in :mod:`.postprocess`
  (``gsi_interpolate``/``smooth_tracks``; CLI ``mot --gsi``) rather than
  on this facade.

Tracker-algorithm integration is the reference's own future-enhancements
list (reference README.md); DeepSORT itself is the reference algorithm
(reference deepsort_tracker.py:15-141). This facade is literally
:class:`~aicamera_tpu.tracker_api.DeepSORT` with the upgrade defaults
flipped on — every component is individually toggleable there; this class
is the named preset, same ``update(bboxes, confs, class_ids, frame)``
contract.

The matching-cascade difference: the StrongSORT paper drops DeepSORT's
age-cascade for one global assignment ("vanilla matching") — a *relaxation*
made viable by its stronger appearance model. This facade keeps the
reference's cascade (identical semantics to :class:`DeepSORT`), which the
paper reports as slightly worse on MOT17 but is required here for parity
with the reference's tracker core.

Use ``TrackingPipeline(tracker="strongsort")`` / CLI ``--tracker
strongsort`` for the fused chunked pipeline with the same preset.
"""

from __future__ import annotations

from typing import Optional, Tuple

from . import config
from .tracker_api import DeepSORT


class StrongSORT(DeepSORT):
    """DeepSORT with the StrongSORT defaults: EMA gallery + NSA Kalman +
    camera-motion compensation. All knobs remain overridable."""

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
                 gallery_strategy: str = "ema",
                 ema_alpha: float = 0.9,
                 gmc: str | bool = "affine",
                 nsa: bool = True):
        super().__init__(
            reid_model_path=reid_model_path,
            reid_input_shape=reid_input_shape,
            max_cosine_distance=max_cosine_distance,
            nn_budget=nn_budget,
            max_iou_distance=max_iou_distance,
            max_age=max_age,
            n_init=n_init,
            min_detection_confidence=min_detection_confidence,
            max_tracks=max_tracks,
            max_detections=max_detections,
            max_reid_crops=max_reid_crops,
            capture_features=capture_features,
            gallery_strategy=gallery_strategy,
            ema_alpha=ema_alpha,
            gmc=gmc,
            nsa=nsa)
