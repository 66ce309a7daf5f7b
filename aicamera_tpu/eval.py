"""MOT evaluation: MOTA / MOTP / ID-switch accounting.

The reference lists MOT metrics as future work (reference README.md:212) —
this module provides them: the CLEAR-MOT protocol with IoU-based
frame-by-frame correspondence (Hungarian on 1-IoU with a match gate),
tracking ID consistency across frames.

Use :func:`evaluate_mot` on per-frame (ground truth, hypothesis) box/id
lists, e.g. to score the tracker against MOT-format annotations or to
regression-test against a recorded golden run.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


@dataclasses.dataclass
class MOTResult:
    mota: float
    motp: float          # mean IoU over matched pairs (higher is better)
    id_switches: int
    false_positives: int
    misses: int
    matches: int
    num_gt: int

    def as_dict(self):
        return dataclasses.asdict(self)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) xyxy -> (N,M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                              1e-9)


def evaluate_mot(gt_frames: Sequence[Tuple[np.ndarray, np.ndarray]],
                 hyp_frames: Sequence[Tuple[np.ndarray, np.ndarray]],
                 iou_threshold: float = 0.5) -> MOTResult:
    """CLEAR-MOT over a sequence.

    Args:
        gt_frames: per frame, (boxes_xyxy (N,4), ids (N,)) ground truth.
        hyp_frames: per frame, (boxes_xyxy (M,4), ids (M,)) tracker output.
        iou_threshold: minimum IoU for a valid correspondence.

    Returns:
        MOTResult with MOTA = 1 - (FN + FP + IDSW) / num_gt and MOTP =
        mean IoU of matched pairs.
    """
    assert len(gt_frames) == len(hyp_frames)
    last_match: Dict[int, int] = {}  # gt id -> hyp id from previous frames
    fp = fn = idsw = matches = num_gt = 0
    iou_sum = 0.0

    for (gt_boxes, gt_ids), (hyp_boxes, hyp_ids) in zip(gt_frames,
                                                        hyp_frames):
        gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
        hyp_boxes = np.asarray(hyp_boxes, np.float32).reshape(-1, 4)
        gt_ids = np.asarray(gt_ids).reshape(-1)
        hyp_ids = np.asarray(hyp_ids).reshape(-1)
        num_gt += len(gt_ids)

        iou = _iou_matrix(gt_boxes, hyp_boxes)
        matched_gt = set()
        matched_hyp = set()

        # CLEAR-MOT: keep last known correspondences when still valid.
        # A kept pair has the same hyp id as before, so it can never be a
        # switch; switches surface in the Hungarian stage when the kept
        # hyp is gone/gated or (after the claimed-check below) was taken
        # by the gt that last owned it.
        for gi, g_id in enumerate(gt_ids):
            if g_id in last_match:
                h_id = last_match[g_id]
                hj = np.flatnonzero(hyp_ids == h_id)
                # the claimed-check matters when two gt ids share a last
                # hyp id (the hyp jumped objects): only one may keep it;
                # the other must re-match and be charged a switch
                if (len(hj) and int(hj[0]) not in matched_hyp
                        and iou[gi, hj[0]] >= iou_threshold):
                    matched_gt.add(gi)
                    matched_hyp.add(int(hj[0]))
                    iou_sum += float(iou[gi, hj[0]])
                    matches += 1

        # Hungarian on the rest
        free_gt = [i for i in range(len(gt_ids)) if i not in matched_gt]
        free_hyp = [j for j in range(len(hyp_ids)) if j not in matched_hyp]
        if free_gt and free_hyp:
            sub = 1.0 - iou[np.ix_(free_gt, free_hyp)]
            ri, ci = linear_sum_assignment(sub)
            for r, c in zip(ri, ci):
                gi, hj = free_gt[r], free_hyp[c]
                if iou[gi, hj] >= iou_threshold:
                    g_id, h_id = int(gt_ids[gi]), int(hyp_ids[hj])
                    if g_id in last_match and last_match[g_id] != h_id:
                        idsw += 1
                    last_match[g_id] = h_id
                    matched_gt.add(gi)
                    matched_hyp.add(hj)
                    iou_sum += float(iou[gi, hj])
                    matches += 1

        fn += len(gt_ids) - len(matched_gt)
        fp += len(hyp_ids) - len(matched_hyp)

    mota = 1.0 - (fn + fp + idsw) / max(num_gt, 1)
    motp = iou_sum / max(matches, 1)
    return MOTResult(mota=mota, motp=motp, id_switches=idsw,
                     false_positives=fp, misses=fn, matches=matches,
                     num_gt=num_gt)
