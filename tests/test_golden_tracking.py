"""Golden regression: synthetic multi-object scenario through the full core,
scored with the CLEAR-MOT evaluator (perfect detections in -> the tracker
must produce near-perfect MOT metrics and stable identities).

This is the regression harness the reference lacks (SURVEY.md §4: no
golden-output tests, MOT metrics listed as future work): any semantic drift
in the Kalman filter, association, cascade or lifecycle logic shows up as
lost MOTA, ID switches, or changed id assignments.
"""

import numpy as np
import pytest

from aicamera_tpu.core import (TrackerParams, init_state, make_detections,
                               predict, update)
from aicamera_tpu.core.tracker import get_outputs
from aicamera_tpu.eval import evaluate_mot

PARAMS = TrackerParams(max_tracks=32, max_detections=16, nn_budget=10,
                       feature_dim=32, n_init=3, max_age=30)


def unit_feature(seed):
    rng = np.random.RandomState(seed)
    f = rng.rand(PARAMS.feature_dim).astype(np.float32)
    return f / np.linalg.norm(f)


def synthetic_scene(n_frames=40):
    """Three objects: two crossing linearly, one occluded mid-sequence."""
    objs = {
        1: dict(feat=unit_feature(1),
                traj=lambda t: [50 + 6 * t, 100, 40, 80]),
        2: dict(feat=unit_feature(2),
                traj=lambda t: [400 - 6 * t, 110, 42, 78]),
        3: dict(feat=unit_feature(3),
                traj=lambda t: [220, 30 + 4 * t, 36, 70]),
    }
    frames = []
    for t in range(n_frames):
        boxes, ids, feats = [], [], []
        for oid, o in objs.items():
            if oid == 3 and 15 <= t < 23:
                continue  # occlusion window
            boxes.append(o["traj"](t))
            ids.append(oid)
            feats.append(o["feat"])
        frames.append((np.array(boxes, np.float32), np.array(ids),
                       np.array(feats, np.float32)))
    return frames


@pytest.fixture(scope="module")
def tracked():
    frames = synthetic_scene()
    s = init_state(PARAMS)
    gt, hyp = [], []
    for boxes, ids, feats in frames:
        s = predict(s, PARAMS)
        d = make_detections(boxes, np.full(len(boxes), 0.9, np.float32),
                            np.zeros(len(boxes), np.int32), feats,
                            params=PARAMS)
        s = update(s, d, PARAMS)
        tlbr, tids, cls, conf, mask = get_outputs(s)
        m = np.asarray(mask)
        hyp.append((np.asarray(tlbr)[m], np.asarray(tids)[m]))
        gt_tlbr = boxes.copy()
        gt_tlbr[:, 2:] += gt_tlbr[:, :2]
        gt.append((gt_tlbr, ids))
    return gt, hyp


def test_mot_metrics_near_perfect(tracked):
    gt, hyp = tracked
    res = evaluate_mot(gt, hyp)
    # frames 0-1 have no confirmed tracks yet (n_init=3) and the occluded
    # object re-confirms late; everything else must match.
    assert res.id_switches == 0
    assert res.mota > 0.85, res.as_dict()
    assert res.motp > 0.9, res.as_dict()
    assert res.false_positives == 0


def test_identities_stable_through_crossing_and_occlusion(tracked):
    gt, hyp = tracked
    # map each gt object to the hypothesis id it got at confirmation
    first_map = {}
    for (gt_boxes, gt_ids), (hyp_boxes, hyp_ids) in zip(gt, hyp):
        for gb, gid in zip(gt_boxes, gt_ids):
            if len(hyp_boxes) == 0:
                continue
            centers = (hyp_boxes[:, :2] + hyp_boxes[:, 2:]) / 2
            gc = (gb[:2] + gb[2:]) / 2
            j = np.argmin(np.linalg.norm(centers - gc, axis=1))
            if np.linalg.norm(centers[j] - gc) < 20:
                if gid not in first_map:
                    first_map[gid] = hyp_ids[j]
                else:
                    assert first_map[gid] == hyp_ids[j], (
                        f"object {gid} switched hypothesis id")
    # all three objects were tracked, with distinct ids, assigned in order
    assert sorted(first_map.keys()) == [1, 2, 3]
    assert sorted(first_map.values()) == [1, 2, 3]


def test_crowded_scene_many_tracks_stable():
    """30 simultaneous objects (crowd config): all confirmed, distinct,
    stable ids; MOTA ~1 after warm-up. Exercises the padded-capacity path
    (config 5: 100+ track slots) and the Hungarian under real load."""
    p = TrackerParams(max_tracks=64, max_detections=48, nn_budget=5,
                      feature_dim=32, n_init=2, max_age=10)
    n_obj = 30
    rng = np.random.RandomState(0)
    feats = []
    for i in range(n_obj):
        f = rng.rand(p.feature_dim).astype(np.float32)
        feats.append(f / np.linalg.norm(f))
    feats = np.stack(feats)
    # grid of objects drifting in different directions
    base = np.array([[60.0 * (i % 6) + 10, 70.0 * (i // 6) + 10, 30, 50]
                     for i in range(n_obj)], np.float32)
    vel = rng.uniform(-2, 2, (n_obj, 2)).astype(np.float32)

    s = init_state(p)
    gt, hyp = [], []
    for t in range(25):
        boxes = base.copy()
        boxes[:, :2] += vel * t
        s = predict(s, p)
        d = make_detections(boxes, np.full(n_obj, 0.9, np.float32),
                            np.zeros(n_obj, np.int32), feats, params=p)
        s = update(s, d, p)
        tlbr, tids, cls, conf, mask = get_outputs(s)
        m = np.asarray(mask)
        hyp.append((np.asarray(tlbr)[m], np.asarray(tids)[m]))
        g = boxes.copy()
        g[:, 2:] += g[:, :2]
        gt.append((g, np.arange(1, n_obj + 1)))

    res = evaluate_mot(gt, hyp)
    assert res.id_switches == 0, res.as_dict()
    # only the first frame (pre-confirmation, n_init=2) misses
    assert res.misses == n_obj
    assert res.false_positives == 0
    assert res.mota == pytest.approx(1.0 - n_obj / (25 * n_obj))
    # every object tracked with a distinct id
    final_ids = sorted(hyp[-1][1].tolist())
    assert final_ids == list(range(1, n_obj + 1))
