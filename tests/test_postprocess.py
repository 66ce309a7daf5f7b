"""GSI post-processing tests (postprocess.py): interpolation and GP
smoothing semantics, and the measurable quality effect on MOT scores."""

import numpy as np
import pytest

from aicamera_tpu.eval import evaluate_mot
from aicamera_tpu.postprocess import gsi_smooth, interpolate_tracks


def _traj_frames(n=30, drop=(), jitter=0.0, seed=0, vx=4.0):
    """One object moving right at vx px/frame; returns (gt, hyp)."""
    rng = np.random.RandomState(seed)
    gt, hyp = [], []
    for t in range(n):
        x = 50.0 + vx * t
        box = np.array([[x, 40.0, x + 30.0, 100.0]], np.float32)
        gt.append((box, np.array([1])))
        if t in drop:
            hyp.append((np.zeros((0, 4), np.float32), np.zeros(0, int)))
        else:
            j = rng.uniform(-jitter, jitter, 4).astype(np.float32)
            hyp.append((box + j, np.array([7])))
    return gt, hyp


def test_interpolation_fills_gap_linearly():
    _, hyp = _traj_frames(n=10, drop={3, 4, 5})
    out = interpolate_tracks(hyp)
    assert all(len(ids) == 1 for _, ids in out)
    # frame 4 is exactly midway between sightings 2 and 6
    want = (hyp[2][0][0] + hyp[6][0][0]) / 2.0
    np.testing.assert_allclose(out[4][0][0], want, atol=1e-4)
    # observed frames pass through bitwise
    np.testing.assert_array_equal(out[2][0], hyp[2][0])


def test_interpolation_respects_max_gap():
    _, hyp = _traj_frames(n=30, drop=set(range(5, 20)))
    out = interpolate_tracks(hyp, max_gap=10)
    assert len(out[10][0]) == 0          # 15-frame gap > max_gap: untouched
    out2 = interpolate_tracks(hyp, max_gap=20)
    assert len(out2[10][0]) == 1


def test_interpolation_improves_recall():
    gt, hyp = _traj_frames(n=30, drop={10, 11, 12, 13})
    before = evaluate_mot(gt, hyp)
    after = evaluate_mot(gt, interpolate_tracks(hyp))
    assert before.misses == 4 and after.misses == 0
    assert after.mota > before.mota


def test_gsi_smoothing_reduces_jitter():
    gt, hyp = _traj_frames(n=40, jitter=4.0, seed=3)
    before = evaluate_mot(gt, hyp)
    after = evaluate_mot(gt, gsi_smooth(hyp, tau=8.0))
    # linear motion + iid jitter: the GP mean tracks the line, so the
    # matched-IoU (MOTP) must improve
    assert after.motp > before.motp + 0.01, (before.motp, after.motp)
    assert after.id_switches == 0 and after.misses == 0


def test_gsi_preserves_ids_and_frame_count():
    _, hyp = _traj_frames(n=12, drop={5}, jitter=2.0)
    out = gsi_smooth(hyp)
    assert len(out) == len(hyp)
    ids = {int(i) for _, ids in out for i in ids}
    assert ids == {7}


def test_gsi_short_tracks_pass_through():
    _, hyp = _traj_frames(n=3)
    out = gsi_smooth(hyp)
    for (b0, _), (b1, _) in zip(hyp, out):
        np.testing.assert_array_equal(b0, b1)


def test_empty_input():
    assert interpolate_tracks([]) == []
    assert gsi_smooth([]) == []
    empty = [(np.zeros((0, 4), np.float32), np.zeros(0, int))] * 3
    out = gsi_smooth(empty)
    assert len(out) == 3 and all(len(b) == 0 for b, _ in out)


def test_mot_harness_gsi_flag(tmp_path):
    """python -m aicamera_tpu.mot --gsi: the report gains gsi_* rows and
    the smoothed submission file is written."""
    import cv2
    from aicamera_tpu.mot import main
    seq = tmp_path / "data" / "seq1"
    (seq / "img1").mkdir(parents=True)
    (seq / "gt").mkdir()
    out = tmp_path / "res"
    out.mkdir()
    rng = np.random.RandomState(0)
    with open(seq / "gt" / "gt.txt", "w") as g, \
            open(out / "seq1.txt", "w") as r:
        for t in range(1, 25):
            cv2.imwrite(str(seq / "img1" / f"{t:06d}.jpg"),
                        np.zeros((80, 120, 3), np.uint8))
            x = 10 + 3 * t
            g.write(f"{t},1,{x},20,30,40,1,1,1\n")
            jx, jy = rng.uniform(-3, 3, 2)
            r.write(f"{t},7,{x + jx:.2f},{20 + jy:.2f},30,40,0.9,-1,-1,-1\n")
    report = main(["--data", str(seq.parent), "--out", str(out), "--gsi"])
    row = report["seq1"]
    assert "gsi_mota" in row and "gsi_hota" in row
    assert row["gsi_motp"] >= row["motp"]
    assert (out / "seq1.gsi.txt").exists()


def test_multiple_tracks_kept_separate():
    _, hyp_a = _traj_frames(n=20, drop={8, 9}, vx=4.0)
    hyp = []
    for t, (b, i) in enumerate(hyp_a):
        x2 = 400.0 - 3.0 * t
        b2 = np.array([[x2, 150.0, x2 + 24.0, 200.0]], np.float32)
        hyp.append((np.concatenate([b, b2]) if len(b) else b2,
                    np.concatenate([i, [9]]) if len(i) else
                    np.array([9])))
    out = interpolate_tracks(hyp)
    # track 7's gap filled; track 9 continuous throughout
    assert all(9 in ids.tolist() for _, ids in out)
    assert all(7 in ids.tolist() for _, ids in out)
