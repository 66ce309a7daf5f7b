"""Identity metric oracle tests (eval.py::evaluate_identity).

Scenarios with hand-derivable closed-form IDF1/IDP/IDR under the official
definition (Ristani et al., ECCV 2016: one GLOBAL one-to-one trajectory
assignment minimizing IDFN+IDFP; IDF1 = IDTP/(IDTP + (IDFN+IDFP)/2)),
plus a randomized brute-force oracle that enumerates every injective
gt->hyp trajectory mapping.
"""

import itertools

import numpy as np
import pytest

from aicamera_tpu.eval import evaluate_identity, evaluate_mot

BOX = np.array([[10.0, 10.0, 50.0, 50.0]], np.float32)
BOX2 = np.array([[100.0, 100.0, 140.0, 140.0]], np.float32)
EMPTY = (np.zeros((0, 4), np.float32), np.zeros((0,), int))


def test_perfect_tracking_scores_one():
    gt = [(BOX, np.array([1]))] * 10
    r = evaluate_identity(gt, gt)
    assert r.idf1 == pytest.approx(1.0)
    assert r.idp == pytest.approx(1.0)
    assert r.idr == pytest.approx(1.0)
    assert (r.idtp, r.idfp, r.idfn) == (10, 0, 0)


def test_id_switch_halfway_scores_half():
    """One object over 10 frames, hyp id flips at frame 5. The global
    assignment keeps the better half (5 frames): IDTP=5, IDFN=5 (gt frames
    credited to the losing hyp id), IDFP=5 -> IDF1 = 5/(5+5) = 0.5."""
    gt = [(BOX, np.array([1]))] * 10
    hyp = [(BOX, np.array([7 if i < 5 else 8])) for i in range(10)]
    r = evaluate_identity(gt, hyp)
    assert r.idf1 == pytest.approx(0.5)
    assert (r.idtp, r.idfp, r.idfn) == (5, 5, 5)


def test_unbalanced_switch_keeps_majority_segment():
    """Hyp id flips after 8 of 10 frames: global match keeps the 8-frame
    segment -> IDTP=8, IDFN=2, IDFP=2, IDF1=0.8. CLEAR-MOT counts the
    same event as one switch regardless of where it happens."""
    gt = [(BOX, np.array([1]))] * 10
    hyp = [(BOX, np.array([7 if i < 8 else 8])) for i in range(10)]
    r = evaluate_identity(gt, hyp)
    assert r.idf1 == pytest.approx(0.8)
    assert evaluate_mot(gt, hyp).id_switches == 1


def test_missed_frames_hit_recall_only():
    """Hyp covers 6 of 10 frames, consistent id: IDTP=6, IDFN=4, IDFP=0
    -> IDP=1, IDR=0.6, IDF1 = 6/(6+2) = 0.75."""
    gt = [(BOX, np.array([1]))] * 10
    hyp = [(BOX, np.array([7])) if i < 6 else EMPTY for i in range(10)]
    r = evaluate_identity(gt, hyp)
    assert r.idp == pytest.approx(1.0)
    assert r.idr == pytest.approx(0.6)
    assert r.idf1 == pytest.approx(0.75)


def test_false_positives_hit_precision_only():
    """Perfect coverage plus a spurious second hyp track on 4 frames:
    IDTP=10, IDFN=0, IDFP=4 -> IDR=1, IDP=10/14, IDF1=10/12."""
    gt = [(BOX, np.array([1]))] * 10
    hyp = [(np.concatenate([BOX, BOX2]), np.array([7, 9]))
           if i < 4 else (BOX, np.array([7])) for i in range(10)]
    r = evaluate_identity(gt, hyp)
    assert r.idr == pytest.approx(1.0)
    assert r.idp == pytest.approx(10 / 14)
    assert r.idf1 == pytest.approx(10 / 12)


def test_swapped_identities_cross():
    """Two objects whose hyp ids swap halfway (10 frames each): each
    trajectory pair overlaps on 5 frames, so any assignment yields
    IDTP=10 of 20 -> IDF1 = 0.5."""
    gt, hyp = [], []
    for i in range(10):
        gt.append((np.concatenate([BOX, BOX2]), np.array([1, 2])))
        ids = [7, 8] if i < 5 else [8, 7]
        hyp.append((np.concatenate([BOX, BOX2]), np.array(ids)))
    r = evaluate_identity(gt, hyp)
    assert r.idf1 == pytest.approx(0.5)


def test_empty_inputs():
    r = evaluate_identity([EMPTY] * 3, [EMPTY] * 3)
    assert np.isnan(r.idf1)
    # no gt, some hyp: everything is a false positive
    r = evaluate_identity([EMPTY] * 3, [(BOX, np.array([7]))] * 3)
    assert r.idf1 == pytest.approx(0.0)
    assert r.idfp == 3
    # gt, no hyp: everything is a miss
    r = evaluate_identity([(BOX, np.array([1]))] * 3, [EMPTY] * 3)
    assert r.idf1 == pytest.approx(0.0)
    assert r.idfn == 3


def _brute_force_identity(gt_frames, hyp_frames, thr=0.5):
    """Enumerate every injective gt->hyp trajectory mapping; maximize
    IDTP = sum of per-pair frame matches (IoU >= thr, no per-frame
    bijection — the same potential-match definition as the implementation
    and TrackEval)."""
    from aicamera_tpu.eval import _iou_matrix
    g_ids = sorted({int(i) for _, ids in gt_frames for i in ids})
    h_ids = sorted({int(i) for _, ids in hyp_frames for i in ids})
    pot = {}
    for (gb, gi), (hb, hi) in zip(gt_frames, hyp_frames):
        if len(gi) and len(hi):
            iou = _iou_matrix(np.asarray(gb, np.float32).reshape(-1, 4),
                              np.asarray(hb, np.float32).reshape(-1, 4))
            for a, b in zip(*np.nonzero(iou >= thr)):
                k = (int(gi[a]), int(hi[b]))
                pot[k] = pot.get(k, 0) + 1
    num_gt = sum(len(i) for _, i in gt_frames)
    num_hyp = sum(len(i) for _, i in hyp_frames)
    best = 0
    k = min(len(g_ids), len(h_ids))
    for r in range(k + 1):
        for g_sub in itertools.combinations(g_ids, r):
            for h_perm in itertools.permutations(h_ids, r):
                best = max(best, sum(pot.get((g, h), 0)
                                     for g, h in zip(g_sub, h_perm)))
    idtp = best
    idfn = num_gt - idtp
    idfp = num_hyp - idtp
    return idtp / max(idtp + 0.5 * idfn + 0.5 * idfp, 1e-9), idtp


def test_randomized_brute_force_oracle():
    """Random small scenes: the LAP-based implementation must equal the
    exhaustive search over all injective trajectory mappings."""
    rng = np.random.default_rng(0)
    grid = np.array([[0, 0, 40, 40], [60, 0, 100, 40], [0, 60, 40, 100],
                     [60, 60, 100, 100]], np.float32)
    for case in range(30):
        n_frames = int(rng.integers(2, 7))
        gt, hyp = [], []
        for _ in range(n_frames):
            n_g = int(rng.integers(0, 4))
            n_h = int(rng.integers(0, 4))
            g_slots = rng.choice(4, size=n_g, replace=False)
            h_slots = rng.choice(4, size=n_h, replace=False)
            # jitter hyp boxes so some fall below the IoU gate
            jitter = rng.uniform(-15, 15, size=(n_h, 1)).astype(np.float32)
            gt.append((grid[g_slots], g_slots + 1))
            hyp.append((grid[h_slots] + jitter, h_slots + 101
                        if case % 2 else rng.permutation(4)[:n_h] + 101))
        r = evaluate_identity(gt, hyp)
        bf_idf1, bf_idtp = _brute_force_identity(gt, hyp)
        if r.num_gt == 0 and r.num_hyp == 0:
            assert np.isnan(r.idf1)
            continue
        assert r.idtp == bf_idtp, f"case {case}: {r.idtp} != {bf_idtp}"
        assert r.idf1 == pytest.approx(bf_idf1), f"case {case}"


def test_fragmentation_scores_lower_than_clean():
    """A hyp that fragments into 3 ids scores lower IDF1 than one that
    fragments into 2, which scores lower than clean — strict ordering."""
    gt = [(BOX, np.array([1]))] * 12
    clean = [(BOX, np.array([7]))] * 12
    two = [(BOX, np.array([7 if i < 6 else 8])) for i in range(12)]
    three = [(BOX, np.array([7 + i // 4])) for i in range(12)]
    f_clean = evaluate_identity(gt, clean).idf1
    f_two = evaluate_identity(gt, two).idf1
    f_three = evaluate_identity(gt, three).idf1
    assert f_clean > f_two > f_three
    assert f_clean == pytest.approx(1.0)
    assert f_two == pytest.approx(0.5)
    assert f_three == pytest.approx(4 / 12)
