"""MOT-Challenge harness tests: format I/O, scoring, aggregation, runner."""

import numpy as np
import pytest

from aicamera_tpu.eval import MOTResult
from aicamera_tpu.mot import (MOTFrame, aggregate, discover_sequences,
                              evaluate_sequence, load_mot_file, run_sequence,
                              write_mot_file)


def _write(path, lines):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines) + "\n")


def test_load_mot_file_parses_and_converts(tmp_path):
    p = tmp_path / "det.txt"
    # frame,id,x,y,w,h,conf,class,vis — MOT x/y are 1-based
    _write(p, ["1,5,11,21,30,40,0.9,-1,-1",
               "1,6,101,201,10,10,0.8,-1,-1",
               "3,5,12,22,30,40,0.7,-1,-1"])
    frames = load_mot_file(p)
    assert set(frames) == {1, 3}
    f1 = frames[1]
    assert f1.ids.tolist() == [5, 6]
    # 1-based tlwh (11,21,30,40) -> 0-based xyxy (10,20,40,60)
    np.testing.assert_allclose(f1.boxes[0], [10, 20, 40, 60])
    np.testing.assert_allclose(f1.conf, [0.9, 0.8])


def test_load_gt_filters_flag_and_class(tmp_path):
    p = tmp_path / "gt.txt"
    _write(p, ["1,1,10,10,10,10,1,1,1.0",    # keep: considered pedestrian
               "1,2,10,10,10,10,0,1,1.0",    # drop: consider flag 0
               "1,3,10,10,10,10,1,7,1.0"])   # drop: class 7 (static person)
    frames = load_mot_file(p, min_confidence=1, target_classes=(1,))
    assert frames[1].ids.tolist() == [1]


def test_write_round_trip(tmp_path):
    frames = {
        1: MOTFrame(boxes=np.array([[10.0, 20.0, 40.0, 60.0]], np.float32),
                    ids=np.array([7]), conf=np.array([0.5], np.float32)),
        2: MOTFrame(boxes=np.array([[0.0, 0.0, 5.0, 5.0]], np.float32),
                    ids=np.array([8]), conf=np.array([1.0], np.float32)),
    }
    p = tmp_path / "res.txt"
    write_mot_file(p, frames)
    back = load_mot_file(p)
    assert set(back) == {1, 2}
    np.testing.assert_allclose(back[1].boxes, frames[1].boxes, atol=1e-2)
    assert back[1].ids.tolist() == [7]


def test_evaluate_sequence_perfect_and_noisy(tmp_path):
    gt_lines, res_lines = [], []
    for t in range(1, 11):
        for tid in (1, 2):
            x = 10 + 5 * t + 100 * tid
            gt_lines.append(f"{t},{tid},{x},50,20,40,1,1,1.0")
            res_lines.append(f"{t},{tid + 10},{x},50,20,40,0.9,-1,-1")
    gt_p = tmp_path / "seq" / "gt" / "gt.txt"
    res_p = tmp_path / "res.txt"
    _write(gt_p, gt_lines)
    _write(res_p, res_lines)
    r = evaluate_sequence(gt_p, res_p)
    assert r.mota == 1.0 and r.id_switches == 0
    assert r.num_gt == 20 and r.matches == 20
    assert r.motp == pytest.approx(1.0)

    # drop one hypothesis frame entirely -> 2 misses
    res2 = [ln for ln in res_lines if not ln.startswith("5,")]
    _write(res_p, res2)
    r2 = evaluate_sequence(gt_p, res_p)
    assert r2.misses == 2 and r2.false_positives == 0
    assert r2.mota == pytest.approx(1.0 - 2 / 20)


def test_evaluate_sequence_identity(tmp_path):
    gt_lines, res_lines = [], []
    for t in range(1, 11):
        x = 10 + 5 * t
        gt_lines.append(f"{t},1,{x},50,20,40,1,1,1.0")
        # hyp id flips at frame 6 -> IDTP=5, IDFN=5, IDFP=5 -> IDF1=0.5
        hid = 11 if t <= 5 else 12
        res_lines.append(f"{t},{hid},{x},50,20,40,0.9,-1,-1")
    gt_p = tmp_path / "seq" / "gt" / "gt.txt"
    res_p = tmp_path / "res.txt"
    _write(gt_p, gt_lines)
    _write(res_p, res_lines)
    from aicamera_tpu.mot import evaluate_sequence_identity
    r = evaluate_sequence_identity(gt_p, res_p)
    assert r.idf1 == pytest.approx(0.5)
    assert (r.idtp, r.idfn, r.idfp) == (5, 5, 5)


def test_aggregate_pools_counts():
    a = MOTResult(mota=0.9, motp=0.8, id_switches=1, false_positives=2,
                  misses=3, matches=10, num_gt=60)
    b = MOTResult(mota=0.5, motp=0.6, id_switches=2, false_positives=4,
                  misses=6, matches=30, num_gt=40)
    agg = aggregate({"a": a, "b": b})
    assert agg.num_gt == 100
    assert agg.id_switches == 3
    assert agg.mota == pytest.approx(1.0 - (9 + 6 + 3) / 100)
    # motp pools by match count: (0.8*10 + 0.6*30) / 40
    assert agg.motp == pytest.approx((8 + 18) / 40)


def test_discover_and_run_sequence(tmp_path):
    cv2 = pytest.importorskip("cv2")
    seq = tmp_path / "SYN-01"
    img1 = seq / "img1"
    img1.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for t in range(4):
        frame = rng.integers(0, 255, (96, 128, 3), np.uint8)
        cv2.imwrite(str(img1 / f"{t + 1:06d}.jpg"), frame)
    assert discover_sequences(tmp_path) == [seq]

    from aicamera_tpu.core.state import TrackerParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(
        input_shape=(128, 128), chunk_size=2,
        tracker_params=TrackerParams(max_tracks=16, max_detections=8,
                                     nn_budget=4, feature_dim=512),
        max_reid_crops=4)
    hyp = run_sequence(seq, pipe)
    # untrained weights: no tracks expected, but the runner must complete
    # and produce MOT-format-writable output
    out = tmp_path / "res.txt"
    write_mot_file(out, hyp)
    assert out.exists()
