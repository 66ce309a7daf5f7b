"""Functional checks for the round-4 fine-tuned checkpoints:

- ``yolov8n_synthetic_crowd.msgpack`` (scripts/train_synthetic.py
  --crowd): must detect a useful fraction of a dense crowd scene — the
  base checkpoint finds ~20% (out-of-distribution density).
- ``yolov8n_clip_adapted.msgpack`` (scripts/selftrain_clip.py): must
  keep synthetic-world competence (the save gate enforces it on TPU;
  re-checked here hardware-free) and produce HIGH-margin detections on
  the real reference clip, which is the whole point of self-training
  (bf16 NMS ordering flips between batch shapes when scores tie).

Skipped (not failed) where a checkpoint or the clip is absent.
"""

from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
CROWD_W = ROOT / "models" / "detection" / "yolov8n_synthetic_crowd.msgpack"
ADAPTED_W = ROOT / "models" / "detection" / "yolov8n_clip_adapted.msgpack"
BASE_W = ROOT / "models" / "detection" / "yolov8n_synthetic.msgpack"
CLIP = Path("/root/reference/assets/aicamera_test_clip.mp4")


def _iou_one(a, bs):
    x1 = np.maximum(a[0], bs[:, 0])
    y1 = np.maximum(a[1], bs[:, 1])
    x2 = np.minimum(a[2], bs[:, 2])
    y2 = np.minimum(a[3], bs[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (bs[:, 2] - bs[:, 0]) * (bs[:, 3] - bs[:, 1]) - inter)
    return inter / np.maximum(ua, 1e-9)


@pytest.mark.slow
@pytest.mark.skipif(not CROWD_W.exists(),
                    reason="crowd checkpoint not trained "
                           "(scripts/train_synthetic.py --crowd)")
def test_crowd_checkpoint_finds_the_crowd():
    """>=40% recall at IoU 0.5 on a fresh crowd scene (visible gt only).
    The base checkpoint measured ~0.2 at this density."""
    import sys
    sys.path.insert(0, str(ROOT / "scripts"))
    from train_synthetic import _crowd_world
    from aicamera_tpu.detector import YOLODetector
    from aicamera_tpu.synthetic import TemporalWorld

    world = TemporalWorld(_crowd_world(), seed=77, speed=3.0)
    for _ in range(4):
        f, b, ids, cls, v = world.step()
    det = YOLODetector(engine_path=str(CROWD_W))
    boxes, scores, cids, _ = det.detect(f)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    gt = b[v]
    assert len(gt) >= 50, f"crowd world should be dense, got {len(gt)}"
    hits = sum(1 for g in gt
               if len(boxes) and _iou_one(g, boxes).max() >= 0.5)
    recall = hits / len(gt)
    assert recall >= 0.4, f"crowd recall {recall:.2f} ({hits}/{len(gt)})"


@pytest.mark.slow
@pytest.mark.skipif(not (ADAPTED_W.exists() and CLIP.exists()),
                    reason="clip-adapted checkpoint or reference clip "
                           "absent (scripts/selftrain_clip.py)")
def test_clip_adapted_checkpoint_has_score_margin_on_real_video():
    """On real clip frames the adapted checkpoint's detections must be
    HIGH-confidence (median top-10 score >= 0.6) — the base synthetic
    checkpoint's scores cluster near the threshold, which is exactly
    what made chunk-shape bf16 NMS ordering unstable (68.6% row
    agreement, docs/CLIP_PARITY.md)."""
    import cv2
    from aicamera_tpu.detector import YOLODetector

    cap = cv2.VideoCapture(str(CLIP))
    frames = []
    for _ in range(250):
        ok, f = cap.read()
        if not ok:
            break
        if len(frames) < 3 and cap.get(cv2.CAP_PROP_POS_FRAMES) % 100 == 0:
            frames.append(f)
    cap.release()
    assert frames
    det = YOLODetector(engine_path=str(ADAPTED_W))
    tops = []
    for f in frames:
        _, scores, _, _ = det.detect(f)
        s = np.sort(np.asarray(scores).reshape(-1))[::-1]
        if len(s):
            tops.extend(s[:10])
    assert tops, "adapted checkpoint found nothing on the clip"
    assert float(np.median(tops)) >= 0.6, (
        f"median top score {np.median(tops):.3f} — margins not sharpened")
