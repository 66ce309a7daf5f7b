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
