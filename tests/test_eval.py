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
