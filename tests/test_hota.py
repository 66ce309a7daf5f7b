"""HOTA metric oracle tests (eval.py::evaluate_hota).

Every scenario has a hand-derivable closed-form score under the official
TrackEval decomposition (HOTA = mean over alpha of sqrt(DetA * AssA);
AssA = TP-weighted association Jaccard TPA/(TPA+FNA+FPA)); these pin the
implementation to the published definitions (Luiten et al., IJCV 2021).
"""

import numpy as np
import pytest

from aicamera_tpu.eval import evaluate_hota, evaluate_mot

BOX = np.array([[10.0, 10.0, 50.0, 50.0]], np.float32)
BOX2 = np.array([[100.0, 100.0, 140.0, 140.0]], np.float32)
FAR = np.array([[300.0, 300.0, 340.0, 340.0]], np.float32)


def _seq(pairs):
    """[(gt_ids, hyp_ids)] with every id reusing BOX/BOX2 by index."""
    boxes = {0: BOX[0], 1: BOX2[0]}
    gt, hyp = [], []
    for g_ids, h in pairs:
        gt.append((np.stack([boxes[i % 2] for i in g_ids])
                   if g_ids else np.zeros((0, 4), np.float32),
                   np.asarray(g_ids, int)))
        hyp.append(h)
    return gt, hyp


def test_perfect_tracking_scores_one():
    gt = [(BOX, np.array([1]))] * 10
    r = evaluate_hota(gt, gt)
    assert r.hota == pytest.approx(1.0)
    assert r.det_a == pytest.approx(1.0)
    assert r.ass_a == pytest.approx(1.0)
    assert r.loc_a == pytest.approx(1.0)


def test_id_switch_halfway():
    """One object, hyp id flips at frame 5: DetA=1, each pair's
    association Jaccard = 5/(10+5-5) = 0.5 -> HOTA = sqrt(0.5)."""
    gt = [(BOX, np.array([1]))] * 10
    hyp = [(BOX, np.array([7 if i < 5 else 8])) for i in range(10)]
    r = evaluate_hota(gt, hyp)
    assert r.det_a == pytest.approx(1.0)
    assert r.ass_a == pytest.approx(0.5)
    assert r.hota == pytest.approx(np.sqrt(0.5))
    # CLEAR-MOT sees the same event as exactly one switch
    assert evaluate_mot(gt, hyp).id_switches == 1


def test_half_frames_missed():
    """Hyp covers 5 of 10 frames with one id: TP=5, FN=5 -> DetA=0.5;
    pair Jaccard = 5/(10+5-5) = 0.5 -> HOTA = 0.5."""
    gt = [(BOX, np.array([1]))] * 10
    hyp = [(BOX, np.array([7])) if i < 5 else
           (np.zeros((0, 4), np.float32), np.zeros((0,), int))
           for i in range(10)]
    r = evaluate_hota(gt, hyp)
    assert r.det_a == pytest.approx(0.5)
    assert r.ass_a == pytest.approx(0.5)
    assert r.hota == pytest.approx(0.5)


def test_spurious_track_costs_det_not_ass():
    """A far-away FP track every frame: DetA = 10/20 = 0.5, AssA stays 1
    (the matched pair is never contested) -> HOTA = sqrt(0.5)."""
    gt = [(BOX, np.array([1]))] * 10
    hyp = [(np.concatenate([BOX, FAR]), np.array([7, 9]))] * 10
    r = evaluate_hota(gt, hyp)
    assert r.det_a == pytest.approx(0.5)
    assert r.ass_a == pytest.approx(1.0)
    assert r.hota == pytest.approx(np.sqrt(0.5))


def test_localization_threshold_sweep():
    """Hyp boxes at IoU 0.62 vs gt: a TP at the 12 alphas <= 0.60 and a
    miss+FP at the 7 above -> HOTA = 12/19, LocA = 0.62."""
    hyp_box = np.array([[10.0, 10.0, 50.0, 34.8]], np.float32)  # IoU .62
    gt = [(BOX, np.array([1]))] * 6
    hyp = [(hyp_box, np.array([7]))] * 6
    r = evaluate_hota(gt, hyp)
    assert r.hota == pytest.approx(12 / 19)
    # LocA averages over ALL alphas (zero at the 7 empty ones, TrackEval
    # convention), so 0.62 * 12/19
    assert r.loc_a == pytest.approx(0.62 * 12 / 19, abs=1e-3)
    by_a = r.hota_by_alpha
    assert by_a[0.6] == pytest.approx(1.0)
    assert by_a[0.65] == pytest.approx(0.0)


def test_identity_swap_every_frame():
    """Two objects whose hyp ids alternate every frame: each of the four
    (gt, hyp) pairs matches 5 of 10 frames -> pair Jaccard 5/15 ->
    AssA = 1/3, DetA = 1 -> HOTA = sqrt(1/3)."""
    gt = [(np.concatenate([BOX, BOX2]), np.array([1, 2]))] * 10
    hyp = [(np.concatenate([BOX, BOX2]),
            np.array([7, 8]) if i % 2 == 0 else np.array([8, 7]))
           for i in range(10)]
    r = evaluate_hota(gt, hyp)
    assert r.det_a == pytest.approx(1.0)
    assert r.ass_a == pytest.approx(1 / 3)
    assert r.hota == pytest.approx(np.sqrt(1 / 3))
    # consistent ids on the same boxes score strictly higher
    hyp_ok = [(np.concatenate([BOX, BOX2]), np.array([7, 8]))] * 10
    assert evaluate_hota(gt, hyp_ok).hota > r.hota


def test_empty_cases():
    empty = (np.zeros((0, 4), np.float32), np.zeros((0,), int))
    # no ground truth anywhere: undefined
    r = evaluate_hota([empty] * 3, [(BOX, np.array([7]))] * 3)
    assert np.isnan(r.hota)
    # no hypotheses: DetA = 0 -> HOTA = 0
    r = evaluate_hota([(BOX, np.array([1]))] * 3, [empty] * 3)
    assert r.hota == pytest.approx(0.0)
    assert r.det_a == pytest.approx(0.0)


def test_id_label_invariance():
    """Globally renaming ids (both sides) must not change any score."""
    rng = np.random.RandomState(0)
    gt, hyp = [], []
    for _ in range(12):
        n = rng.randint(0, 3)
        ids = rng.permutation([1, 2, 3])[:n]
        boxes = np.stack([BOX[0] + 60 * i for i in ids]) if n else \
            np.zeros((0, 4), np.float32)
        gt.append((boxes, ids))
        keep = rng.rand(n) > 0.2
        hyp.append((boxes[keep] + rng.uniform(-2, 2, (int(keep.sum()), 4)
                                              ).astype(np.float32),
                    ids[keep] + 40))
    a = evaluate_hota(gt, hyp)
    hyp2 = [(b, i * 13 + 5) for b, i in hyp]
    gt2 = [(b, i * 7 + 1000) for b, i in gt]
    b = evaluate_hota(gt2, hyp2)
    assert a.hota == pytest.approx(b.hota)
    assert a.ass_a == pytest.approx(b.ass_a)
    assert 0.0 <= a.hota <= 1.0
