"""Functional regression: trained-on-synthetic weights drive the REAL
pipeline to correct detections and stable track identities.

This is the hardware- and network-free substitute for validating with the
reference's downloadable weights: ``scripts/train_synthetic.py`` trains
the framework's own YOLOv8n on :mod:`aicamera_tpu.synthetic` scenes (on
TPU) and commits ``models/detection/yolov8n_synthetic.msgpack``; these
tests exercise the full inference stack (letterbox preprocess → YOLOv8 →
DFL decode → NMS → un-letterbox → DeepSORT association/lifecycle) against
exact synthetic ground truth on the CPU backend.

Skipped (not failed) if the checkpoint has not been trained yet.
"""

from pathlib import Path

import numpy as np
import pytest

WEIGHTS = Path(__file__).resolve().parent.parent / \
    "models" / "detection" / "yolov8n_synthetic.msgpack"

pytestmark = pytest.mark.skipif(
    not WEIGHTS.exists(),
    reason="synthetic checkpoint not trained (scripts/train_synthetic.py)")


@pytest.fixture(scope="module")
def pipeline():
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    return TrackingPipeline(chunk_size=6, yolo_weights=str(WEIGHTS))


def _iou_matrix(a, b):
    from aicamera_tpu.eval import _iou_matrix as m
    return m(a, b)


def test_detector_precision_recall(pipeline):
    """Static scenes: the detect path finds the synthetic objects."""
    import jax
    from aicamera_tpu.synthetic import WorldSpec, random_scene

    spec = WorldSpec()
    keys = jax.random.split(jax.random.PRNGKey(123), 6)
    frames, gts = [], []
    for k in keys:
        f, b, c, v = random_scene(k, spec)
        frames.append(np.asarray(f))
        v = np.asarray(v)
        gts.append((np.asarray(b)[v], np.asarray(c)[v]))

    tp = fp = fn = 0
    for res, (gb, gc) in zip(pipeline.process_frames(iter(frames)), gts):
        det_b, det_l = res.det_boxes, res.det_labels
        used = np.zeros(len(gb), bool)
        for d in np.argsort(-res.det_scores):
            if len(gb) == 0:
                fp += 1
                continue
            ious = _iou_matrix(det_b[d:d + 1], gb)[0]
            ious[(gc != det_l[d]) | used] = 0.0
            g = int(np.argmax(ious))
            if ious[g] >= 0.5:
                used[g] = True
                tp += 1
            else:
                fp += 1
        fn += int((~used).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    assert prec >= 0.75, (prec, rec, tp, fp, fn)
    assert rec >= 0.70, (prec, rec, tp, fp, fn)


def test_tracking_mota_and_id_stability(pipeline):
    """Moving scene: stable identities end to end (MOT metrics vs gt)."""
    from aicamera_tpu.eval import evaluate_mot
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

    world = TemporalWorld(WorldSpec(max_objects=8, presence=1.0), seed=9,
                          speed=3.0)
    n_frames = 30
    frames, gt_frames = [], []
    for _ in range(n_frames):
        f, b, ids, cls, v = world.step()
        frames.append(f)
        gt_frames.append((b[v], ids[v]))

    pipeline.reset()
    hyp_frames = []
    for res in pipeline.process_frames(iter(frames)):
        if res.tracks:
            arr = np.asarray([t[:4] for t in res.tracks], np.float32)
            ids = np.asarray([t[4] for t in res.tracks], np.int64)
        else:
            arr = np.zeros((0, 4), np.float32)
            ids = np.zeros((0,), np.int64)
        hyp_frames.append((arr, ids))

    # tracks need n_init=3 frames to confirm: score from frame 5 on
    r = evaluate_mot(gt_frames[5:], hyp_frames[5:])
    stats = r.as_dict()
    assert stats["mota"] >= 0.45, stats
    assert stats["id_switches"] <= 6, stats
    assert stats["motp"] >= 0.6, stats
