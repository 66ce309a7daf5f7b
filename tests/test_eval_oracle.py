"""Randomized oracle for the detection-AP evaluator.

An independent, deliberately naive COCO-AP implementation (pure Python
dict/loop matching, explicit right-to-left precision envelope, literal
101-level scan) is run against ``evaluate_detections`` on randomized
scenes stuffed with protocol edge cases: duplicate predictions, tied
scores, empty frames, classes with no gt, predictions with no gt class,
and near-threshold IoUs. Any divergence in the vectorized path
(searchsorted interpolation, claiming order, per-class bucketing) fails
here.
"""

import numpy as np
import pytest

from aicamera_tpu.eval import _iou_matrix, evaluate_detections


def _oracle_ap_one(gt_by_frame, preds, thr):
    """Naive AP for one class at one IoU threshold.

    preds: list of (frame_idx, score, box). Greedy score-descending
    matching to the highest-IoU unclaimed gt (COCO), then 101-point
    interpolated AP.
    """
    n_gt = sum(len(g) for g in gt_by_frame)
    if n_gt == 0:
        return None
    if not preds:
        return 0.0
    claimed = {}
    flags = []
    for fi, score, box in sorted(preds, key=lambda t: -t[1]):
        best_iou, best_j = 0.0, None
        for j, g in enumerate(gt_by_frame[fi]):
            if claimed.get((fi, j)):
                continue
            iou = float(_iou_matrix(np.asarray(box).reshape(1, 4),
                                    np.asarray(g).reshape(1, 4))[0, 0])
            if iou > best_iou:
                best_iou, best_j = iou, j
        if best_j is not None and best_iou >= thr:
            claimed[(fi, best_j)] = True
            flags.append((score, 1))
        else:
            flags.append((score, 0))
    # flags are already in score-descending order
    tp = fp = 0
    pr = []  # (recall, precision) after each prediction
    for _, hit in flags:
        tp += hit
        fp += 1 - hit
        pr.append((tp / n_gt, tp / (tp + fp)))
    # right-to-left precision envelope
    env = []
    best = 0.0
    for r, p in reversed(pr):
        best = max(best, p)
        env.append((r, best))
    env.reverse()
    # 101-point: precision at the first recall >= level, else 0
    total = 0.0
    for level in np.linspace(0.0, 1.0, 101):
        p_at = 0.0
        for r, p in env:
            if r >= level - 1e-12:
                p_at = p
                break
        total += p_at
    return total / 101


def _oracle(gt_frames, pred_frames, thresholds):
    classes = sorted({int(c) for _, ids in gt_frames
                      for c in np.asarray(ids).reshape(-1).tolist()})
    per_thr_cls = []
    for c in classes:
        gt_by_frame = [np.asarray(b, np.float32).reshape(-1, 4)[
            np.asarray(i).reshape(-1) == c] for b, i in gt_frames]
        preds = []
        for fi, (pb, ps, pi) in enumerate(pred_frames):
            pb = np.asarray(pb, np.float32).reshape(-1, 4)
            ps = np.asarray(ps, np.float64).reshape(-1)
            pi = np.asarray(pi).reshape(-1)
            for j in range(len(ps)):
                if int(pi[j]) == c:
                    preds.append((fi, float(ps[j]), pb[j]))
        for thr in thresholds:
            ap = _oracle_ap_one(gt_by_frame, preds, thr)
            if ap is not None:
                per_thr_cls.append(ap)
    return float(np.mean(per_thr_cls)) if per_thr_cls else float("nan")


def _random_scene(rng, n_frames):
    gt_frames, pred_frames = [], []
    for _ in range(n_frames):
        n_gt = rng.integers(0, 5)
        boxes = []
        for _ in range(n_gt):
            x, y = rng.uniform(0, 200, 2)
            w, h = rng.uniform(10, 60, 2)
            boxes.append([x, y, x + w, y + h])
        cls = rng.integers(0, 3, n_gt)
        gt_frames.append((np.asarray(boxes, np.float32).reshape(-1, 4),
                          cls))
        n_pred = rng.integers(0, 7)
        pb, ps, pi = [], [], []
        for _ in range(n_pred):
            if boxes and rng.random() < 0.7:
                # perturb a gt box -> IoUs scattered around the thresholds
                b = np.asarray(boxes[rng.integers(len(boxes))], np.float64)
                b = b + rng.normal(0, 6, 4)
            else:
                x, y = rng.uniform(0, 200, 2)
                w, h = rng.uniform(10, 60, 2)
                b = np.asarray([x, y, x + w, y + h])
            pb.append(b)
            # quantized scores force ties
            ps.append(round(float(rng.random()), 1))
            pi.append(int(rng.integers(0, 4)))  # class 3 never in gt
        pred_frames.append((np.asarray(pb, np.float32).reshape(-1, 4),
                            np.asarray(ps), np.asarray(pi)))
    return gt_frames, pred_frames


@pytest.mark.parametrize("seed", range(20))
def test_ap_matches_independent_oracle(seed):
    rng = np.random.default_rng(seed)
    gt_frames, pred_frames = _random_scene(rng, n_frames=4)
    thresholds = [0.5, 0.75]
    res = evaluate_detections(gt_frames, pred_frames,
                              iou_thresholds=thresholds)
    expect = _oracle(gt_frames, pred_frames, thresholds)
    if np.isnan(expect):
        assert np.isnan(res.map_5095)
    else:
        assert abs(res.map_5095 - expect) < 1e-9, (
            f"seed {seed}: {res.map_5095} vs oracle {expect}")
