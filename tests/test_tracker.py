"""Tracker lifecycle scenarios mirroring the reference's inline test suites
(track.py:174-345, tracker_core.py:201-330, deepsort_tracker.py:203-345)."""

import numpy as np
import pytest

from aicamera_tpu.core import (TrackerParams, init_state, make_detections,
                               predict, update)
from aicamera_tpu.core.state import CONFIRMED, TENTATIVE
from aicamera_tpu.core.tracker import get_outputs

PARAMS = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                       feature_dim=16, n_init=3, max_age=5)


def unit_feature(seed):
    rng = np.random.RandomState(seed)
    f = rng.rand(PARAMS.feature_dim).astype(np.float32)
    return f / np.linalg.norm(f)


def step(s, boxes, feats=None, confs=None, class_ids=None, params=PARAMS):
    s = predict(s, params)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    if confs is None:
        confs = np.full(n, 0.9, np.float32)
    if class_ids is None:
        class_ids = np.zeros(n, np.int32)
    feats = None if feats is None else np.asarray(feats, np.float32)
    d = make_detections(boxes, confs, class_ids, feats, params=params)
    return update(s, d, params)


def active_info(s):
    a = np.asarray(s.active)
    return {
        "n": int(a.sum()),
        "ids": np.asarray(s.track_id)[a].tolist(),
        "state": np.asarray(s.state)[a].tolist(),
        "hits": np.asarray(s.hits)[a].tolist(),
        "tsu": np.asarray(s.tsu)[a].tolist(),
    }


def test_initiation_is_tentative_with_sequential_ids():
    s = init_state(PARAMS)
    s = step(s, [[10, 10, 20, 40], [100, 100, 30, 60]],
             [unit_feature(1), unit_feature(2)])
    info = active_info(s)
    assert info["n"] == 2
    assert info["ids"] == [1, 2]
    assert info["state"] == [TENTATIVE, TENTATIVE]
    assert info["hits"] == [1, 1]
    # no confirmed output yet
    _, _, _, _, mask = get_outputs(s)
    assert not np.asarray(mask).any()


def test_confirm_after_n_init_hits():
    s = init_state(PARAMS)
    f = unit_feature(1)
    for i in range(3):
        s = step(s, [[10 + i, 10 + i, 20, 40]], [f])
    info = active_info(s)
    assert info["state"] == [CONFIRMED]
    assert info["hits"] == [3]
    tlbr, ids, cls, conf, mask = get_outputs(s)
    assert np.asarray(mask).sum() == 1
    assert np.asarray(ids)[np.asarray(mask)][0] == 1


def test_tentative_track_deleted_on_first_miss():
    s = init_state(PARAMS)
    s = step(s, [[10, 10, 20, 40]], [unit_feature(1)])
    assert active_info(s)["n"] == 1
    s = step(s, np.zeros((0, 4)))
    assert active_info(s)["n"] == 0


def test_confirmed_track_survives_max_age_misses_then_deleted():
    s = init_state(PARAMS)
    f = unit_feature(1)
    for i in range(3):
        s = step(s, [[10 + i, 10 + i, 20, 40]], [f])
    for miss in range(PARAMS.max_age):
        s = step(s, np.zeros((0, 4)))
        assert active_info(s)["n"] == 1, f"deleted too early at miss {miss+1}"
    s = step(s, np.zeros((0, 4)))  # tsu becomes max_age + 1 > max_age
    assert active_info(s)["n"] == 0


def test_reacquire_by_appearance_after_occlusion():
    # Confirmed track missed 2 frames; reappears with the same feature at a
    # shifted position -> matched via the appearance cascade, same id.
    s = init_state(PARAMS)
    f = unit_feature(7)
    for i in range(3):
        s = step(s, [[10 + i, 10, 20, 40]], [f])
    for _ in range(2):
        s = step(s, np.zeros((0, 4)))
    s = step(s, [[16, 10, 20, 40]], [f])
    info = active_info(s)
    assert info["ids"] == [1]
    assert info["tsu"] == [0]
    assert info["state"] == [CONFIRMED]


def test_iou_fallback_matches_featureless_detection():
    # A tentative track (no appearance matching for tentative) keeps matching
    # via IoU even when the detection has no feature.
    s = init_state(PARAMS)
    s = step(s, [[10, 10, 20, 40]])           # no feature at all
    s = step(s, [[11, 11, 20, 40]])
    s = step(s, [[12, 12, 20, 40]])
    info = active_info(s)
    assert info["ids"] == [1]
    assert info["state"] == [CONFIRMED]


def test_new_id_for_distinct_appearance_and_position():
    s = init_state(PARAMS)
    f1, f2 = unit_feature(1), unit_feature(99)
    for i in range(3):
        s = step(s, [[10 + i, 10, 20, 40]], [f1])
    # far away box, orthogonal-ish feature -> new track
    s = step(s, [[300, 300, 20, 40]], [f2])
    info = active_info(s)
    assert sorted(info["ids"]) == [1, 2]


def test_gallery_fifo_budget():
    s = init_state(PARAMS)
    f = unit_feature(1)
    for i in range(6):  # budget is 4
        s = step(s, [[10 + i, 10, 20, 40]], [f])
    a = np.asarray(s.active)
    assert np.asarray(s.gallery_count)[a][0] == PARAMS.nn_budget
    assert np.asarray(s.gallery_next)[a][0] == 6 % PARAMS.nn_budget


def test_two_objects_crossing_keep_ids_by_appearance():
    s = init_state(PARAMS)
    f1, f2 = unit_feature(11), unit_feature(22)
    # Objects approach, overlap, and swap sides; appearance should keep ids.
    traj1 = [[100 + 10*i, 100, 20, 40] for i in range(8)]
    traj2 = [[170 - 10*i, 100, 20, 40] for i in range(8)]
    for b1, b2 in zip(traj1, traj2):
        s = step(s, [b1, b2], [f1, f2])
    tlbr, ids, cls, conf, mask = get_outputs(s)
    m = np.asarray(mask)
    boxes = np.asarray(tlbr)[m]
    out_ids = np.asarray(ids)[m]
    # id 1 ends on the right (x ~170), id 2 on the left (x ~100)
    id1_x = boxes[out_ids == 1][0][0]
    id2_x = boxes[out_ids == 2][0][0]
    assert id1_x > id2_x


def test_output_contract_confirmed_and_fresh_only():
    s = init_state(PARAMS)
    f1, f2 = unit_feature(1), unit_feature(2)
    for i in range(3):
        s = step(s, [[10 + i, 10, 20, 40], [200, 200 + i, 30, 60]], [f1, f2])
    # now miss track 2 only
    s = step(s, [[13, 10, 20, 40]], [f1])
    tlbr, ids, cls, conf, mask = get_outputs(s)
    m = np.asarray(mask)
    assert np.asarray(ids)[m].tolist() == [1]  # track 2 has tsu=1 -> excluded
    assert active_info(s)["n"] == 2            # but still alive


def test_class_and_conf_follow_last_match():
    s = init_state(PARAMS)
    f = unit_feature(1)
    s = step(s, [[10, 10, 20, 40]], [f], confs=[0.5], class_ids=[2])
    s = step(s, [[11, 10, 20, 40]], [f], confs=[0.8], class_ids=[2])
    s = step(s, [[12, 10, 20, 40]], [f], confs=[0.9], class_ids=[2])
    tlbr, ids, cls, conf, mask = get_outputs(s)
    m = np.asarray(mask)
    assert np.asarray(cls)[m][0] == 2
    assert np.asarray(conf)[m][0] == pytest.approx(0.9)


def test_capacity_overflow_drops_and_counts():
    small = TrackerParams(max_tracks=2, max_detections=8, nn_budget=4,
                          feature_dim=16, n_init=3, max_age=5)
    s = init_state(small)
    boxes = [[10*i, 10*i, 5, 10] for i in range(1, 5)]
    s = step(s, boxes, params=small)
    assert int(np.asarray(s.active).sum()) == 2
    assert int(np.asarray(s.dropped)) == 2
    assert int(np.asarray(s.next_id)) == 3  # only placed tracks consume ids


def test_slot_reuse_after_deletion():
    s = init_state(PARAMS)
    s = step(s, [[10, 10, 20, 40]], [unit_feature(1)])
    s = step(s, np.zeros((0, 4)))  # tentative dies
    s = step(s, [[500, 500, 20, 40]], [unit_feature(2)])
    info = active_info(s)
    assert info["n"] == 1
    assert info["ids"] == [2]  # id counter advanced past the dead track
