"""MOT metrics on hand-constructed scenarios."""

import numpy as np

from aicamera_tpu.eval import evaluate_mot


def _b(x, y, w=10, h=20):
    return [x, y, x + w, y + h]


def test_perfect_tracking():
    gt = [(np.array([_b(0, 0), _b(50, 50)]), np.array([1, 2]))] * 5
    res = evaluate_mot(gt, gt)
    assert res.mota == 1.0
    assert res.motp == 1.0
    assert res.id_switches == 0


def test_missed_detection_lowers_mota():
    gt = [(np.array([_b(0, 0), _b(50, 50)]), np.array([1, 2]))] * 4
    hyp = [(np.array([_b(0, 0)]), np.array([7]))] * 4  # one target missed
    res = evaluate_mot(gt, hyp)
    assert res.misses == 4
    assert res.false_positives == 0
    assert res.mota == 1.0 - 4 / 8


def test_false_positive_lowers_mota():
    gt = [(np.array([_b(0, 0)]), np.array([1]))] * 4
    hyp = [(np.array([_b(0, 0), _b(200, 200)]), np.array([7, 8]))] * 4
    res = evaluate_mot(gt, hyp)
    assert res.false_positives == 4
    assert res.mota == 1.0 - 4 / 4


def test_id_switch_counted():
    gt = [(np.array([_b(0, 0)]), np.array([1]))] * 4
    hyp = [
        (np.array([_b(0, 0)]), np.array([7])),
        (np.array([_b(0, 0)]), np.array([7])),
        (np.array([_b(0, 0)]), np.array([9])),  # identity flips
        (np.array([_b(0, 0)]), np.array([9])),
    ]
    res = evaluate_mot(gt, hyp)
    assert res.id_switches == 1
    assert res.mota == 1.0 - 1 / 4


def test_motp_reflects_localization():
    gt = [(np.array([_b(0, 0, 10, 10)]), np.array([1]))] * 2
    hyp = [(np.array([_b(2, 0, 10, 10)]), np.array([5]))] * 2  # shifted
    res = evaluate_mot(gt, hyp)
    assert 0.5 < res.motp < 1.0


def test_shared_last_hyp_not_double_matched():
    """Regression: two gt ids whose last_match points at the same hyp id
    must not both 'keep' it — one keeps, the other re-matches (and is
    charged a switch if it lands on a different id) or goes unmatched."""
    # f1: g1->h7 at (0,0); g2->h8 at (100,100)
    # f2: g1 absent; h7 jumps onto g2 -> Hungarian g2->h7 (switch #1)
    # f3: both gt present, only h7 at g2's spot: g1.last==h7, g2.last==h7.
    #     Exactly one may match h7 (it overlaps g2 only); g1 is a miss.
    gt = [
        (np.array([_b(0, 0), _b(100, 100)]), np.array([1, 2])),
        (np.array([_b(100, 100)]), np.array([2])),
        (np.array([_b(0, 0), _b(100, 100)]), np.array([1, 2])),
    ]
    hyp = [
        (np.array([_b(0, 0), _b(100, 100)]), np.array([7, 8])),
        (np.array([_b(100, 100)]), np.array([7])),
        (np.array([_b(100, 100)]), np.array([7])),
    ]
    res = evaluate_mot(gt, hyp)
    # frame 3 has one hyp: exactly 1 match, g1 missed, no phantom FP/match
    assert res.matches == 2 + 1 + 1
    assert res.misses == 0 + 0 + 1
    assert res.false_positives == 0
    assert res.id_switches == 1  # g2: h8 -> h7 in frame 2


def test_alternating_ids_each_flip_counted():
    """A gt alternating h7/h9 every frame: every flip is a switch."""
    gt = [(np.array([_b(0, 0)]), np.array([1]))] * 5
    hyp = [(np.array([_b(0, 0)]), np.array([7 if t % 2 == 0 else 9]))
           for t in range(5)]
    res = evaluate_mot(gt, hyp)
    assert res.id_switches == 4


# ---------------------------------------------------------------------------
# Detection AP (COCO protocol)

from aicamera_tpu.eval import evaluate_detections  # noqa: E402


def test_ap_perfect_detector():
    gt = [(np.array([_b(0, 0), _b(50, 50)]), np.array([0, 2]))] * 3
    pred = [(np.array([_b(0, 0), _b(50, 50)]), np.array([0.9, 0.8]),
             np.array([0, 2]))] * 3
    res = evaluate_detections(gt, pred)
    assert res.ap50 == 1.0
    assert res.ap75 == 1.0
    assert res.map_5095 == 1.0
    assert res.num_gt == 6 and res.num_pred == 6


def test_ap_no_predictions_is_zero():
    gt = [(np.array([_b(0, 0)]), np.array([0]))] * 2
    pred = [(np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,), int))] * 2
    res = evaluate_detections(gt, pred)
    assert res.ap50 == 0.0 and res.map_5095 == 0.0


def test_ap_wrong_class_scores_zero_and_fp():
    gt = [(np.array([_b(0, 0)]), np.array([0]))]
    pred = [(np.array([_b(0, 0)]), np.array([0.9]), np.array([1]))]
    res = evaluate_detections(gt, pred)
    # class 1 has no gt -> excluded (COCO); class 0 has gt, no preds -> 0
    assert res.ap50 == 0.0
    assert res.per_class_ap50 == {0: 0.0}


def test_ap_half_recall():
    """One of two gt boxes found, no FPs: precision 1 up to recall .5.

    101-point AP = mean over levels {0,.01,..,1}: p=1 for the 51 levels
    <= 0.5, p=0 above -> 51/101.
    """
    gt = [(np.array([_b(0, 0), _b(200, 200)]), np.array([0, 0]))]
    pred = [(np.array([_b(0, 0)]), np.array([0.9]), np.array([0]))]
    res = evaluate_detections(gt, pred)
    assert abs(res.ap50 - 51 / 101) < 1e-9


def test_ap_localization_quality_separates_thresholds():
    """A prediction with IoU ~0.6 counts at AP50 but not AP75."""
    gt = [(np.array([[0, 0, 100, 100]]), np.array([0]))]
    # shifted box: inter 70x100, union 130x100 -> IoU ~0.538... use 80
    pred = [(np.array([[20, 0, 120, 100]]), np.array([0.9]),
             np.array([0]))]
    # IoU = 80*100 / (120*100 + ... ) inter [20,100]x[0,100]=8000,
    # union 10000+10000-8000=12000 -> 0.667
    res = evaluate_detections(gt, pred)
    assert res.ap50 == 1.0
    assert res.ap75 == 0.0
    assert 0.0 < res.map_5095 < 1.0


def test_ap_duplicate_detections_penalized():
    """Second detection of an already-claimed gt is a false positive."""
    gt = [(np.array([_b(0, 0)]), np.array([0]))]
    pred = [(np.array([_b(0, 0), _b(0, 0)]), np.array([0.9, 0.8]),
             np.array([0, 0]))]
    res = evaluate_detections(gt, pred)
    # recall hits 1.0 at the first pred (p=1); the dup only lowers
    # precision beyond full recall -> AP stays 1.0 under interpolation
    assert res.ap50 == 1.0


def test_ap_score_ranking_matters():
    """FP ranked above the TP drags interpolated precision to 1/2."""
    gt = [(np.array([_b(0, 0)]), np.array([0]))]
    pred = [(np.array([_b(500, 500), _b(0, 0)]), np.array([0.95, 0.6]),
             np.array([0, 0]))]
    res = evaluate_detections(gt, pred)
    assert abs(res.ap50 - 0.5) < 1e-9


def test_ap_greedy_matches_highest_iou_gt():
    """A pred overlapping two gts claims the higher-IoU one."""
    gt = [(np.array([[0, 0, 100, 100], [60, 0, 160, 100]]),
           np.array([0, 0]))]
    # exact copy of the second gt, plus one for the first
    pred = [(np.array([[60, 0, 160, 100], [0, 0, 100, 100]]),
             np.array([0.9, 0.8]), np.array([0, 0]))]
    res = evaluate_detections(gt, pred)
    assert res.ap50 == 1.0


def test_ap_per_class_breakdown():
    gt = [(np.array([_b(0, 0), _b(200, 200)]), np.array([0, 3]))]
    pred = [(np.array([_b(0, 0)]), np.array([0.9]), np.array([0]))]
    res = evaluate_detections(gt, pred)
    assert res.per_class_ap50[0] == 1.0
    assert res.per_class_ap50[3] == 0.0
    assert abs(res.ap50 - 0.5) < 1e-9


def test_ap_uncomputed_means_are_nan_not_zero():
    """Custom thresholds without .5/.75 and empty gt must yield NaN (not
    a fake 0.0 indistinguishable from a broken detector)."""
    gt = [(np.array([_b(0, 0)]), np.array([0]))]
    pred = [(np.array([_b(0, 0)]), np.array([0.9]), np.array([0]))]
    res = evaluate_detections(gt, pred, iou_thresholds=[0.6])
    assert np.isnan(res.ap50) and np.isnan(res.ap75)
    assert res.map_5095 == 1.0  # computed at 0.6 only

    empty_gt = [(np.zeros((0, 4)), np.zeros((0,), int))]
    res = evaluate_detections(empty_gt, pred)
    assert np.isnan(res.map_5095) and np.isnan(res.ap50)
