"""Failure-mode probes: degenerate inputs must not crash or corrupt state.

The reference handles these through defensive try/except and feature=None
paths (SURVEY.md §5 failure handling); here the same behaviors must hold
inside fixed-shape jitted programs.
"""

import numpy as np
import pytest

from aicamera_tpu.core import tracker as core_tracker
from aicamera_tpu.core.state import (TrackerParams, init_state,
                                     make_detections)

P = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                  max_age=5, n_init=2, feature_dim=8)


_F = np.random.RandomState(7).rand(1, P.feature_dim).astype(np.float32)
_F /= np.linalg.norm(_F)


def _step(state, tlwh, conf=None, feats=None):
    n = len(tlwh)
    if isinstance(feats, str) and feats == "const":
        feats = np.tile(_F, (n, 1))
    dets = make_detections(
        np.asarray(tlwh, np.float32),
        np.full(n, 0.9, np.float32) if conf is None else conf,
        np.zeros(n, np.int32),
        feature=feats, params=P)
    state = core_tracker.predict(state, P)
    return core_tracker.update(state, dets, P)


def _ids(state):
    tlbr, ids, cls, conf, mask = core_tracker.get_outputs(state)
    return sorted(np.asarray(ids)[np.asarray(mask)].tolist())


def test_confirmed_track_survives_misses_within_cascade_depth():
    """Coasting/deletion window matches reference matching_cascade: the
    deepest cascade level reaches tsu == max_age, so max_age-1 consecutive
    misses are recoverable; after max_age misses the track can never
    re-match (tsu is max_age+1 on the reappearance frame) and is deleted
    (reference linear_assignment.py matching_cascade + track mark_missed)."""
    state = init_state(P)
    for _ in range(3):
        state = _step(state, [[10, 10, 20, 40]], feats="const")
    assert _ids(state) == [1]
    # max_age-1 empty frames: track coasts (not output, tsu>0) but survives
    for _ in range(P.max_age - 1):
        state = _step(state, np.zeros((0, 4)))
        assert not np.isnan(np.asarray(state.mean)).any()
    # reappears near the predicted location -> same id
    state = _step(state, [[10, 10, 20, 40]], feats="const")
    assert _ids(state) == [1]
    # max_age misses -> beyond cascade reach; next detections get a new id
    for _ in range(P.max_age):
        state = _step(state, np.zeros((0, 4)))
    state = _step(state, [[10, 10, 20, 40]], feats="const")
    state = _step(state, [[10, 10, 20, 40]], feats="const")
    assert _ids(state) == [2]


def test_nan_and_degenerate_boxes_do_not_poison_state():
    state = init_state(P)
    for _ in range(3):
        state = _step(state, [[10, 10, 20, 40]], feats="const")
    healthy = _ids(state)
    bad = np.array([[np.nan, np.nan, np.nan, np.nan],
                    [50, 50, 0, 0],          # zero-extent
                    [30, 30, -5, -5]],        # negative extent
                   np.float32)
    state = _step(state, bad)
    # the healthy track's state must remain finite
    act = np.asarray(state.active)
    assert np.isfinite(np.asarray(state.mean)[act]).all()
    state = _step(state, [[10, 10, 20, 40]], feats="const")
    assert healthy[0] in _ids(state)


def test_overflow_detections_raise():
    with pytest.raises(ValueError, match="exceed capacity"):
        make_detections(np.zeros((P.max_detections + 1, 4), np.float32),
                        np.zeros(P.max_detections + 1, np.float32),
                        np.zeros(P.max_detections + 1, np.int32), params=P)


def test_all_invalid_frame_is_a_no_op_for_confirmed_tracks():
    state = init_state(P)
    for _ in range(3):
        state = _step(state, [[10, 10, 20, 40]])
    before_id = _ids(state)
    dets = make_detections(np.zeros((4, 4), np.float32),
                           np.zeros(4, np.float32), np.zeros(4, np.int32),
                           valid=np.zeros(4, bool), params=P)
    state = core_tracker.predict(state, P)
    state = core_tracker.update(state, dets, P)
    # no new tracks from invalid detections
    assert int(np.asarray(state.next_id)) == before_id[-1] + 1


def test_conflicting_feature_flags_degrade_to_iou():
    """Detections without features must still match by IoU (the reference's
    ReID-failure degradation, reference reid_model.py:117-123)."""
    state = init_state(P)
    rng = np.random.RandomState(0)
    f = rng.rand(1, P.feature_dim).astype(np.float32)
    for _ in range(3):
        state = _step(state, [[10, 10, 20, 40]], feats=f)
    # same box, NO feature -> IoU stage keeps the id alive
    state = _step(state, [[11, 10, 20, 40]])
    assert _ids(state) == [1]


def test_explicit_weights_path_must_exist(tmp_path):
    """An explicit weights path that cannot be honored must raise, not
    silently fall back to random/default params (reference behavior: a bad
    engine path aborts, aicamera_tracker.py:94-97). Default resolution
    (weights_path=None) keeps its documented random-init fallback."""
    from aicamera_tpu.runtime.params import (resolve_reid_params,
                                             resolve_yolo_params)

    with pytest.raises(FileNotFoundError):
        resolve_yolo_params("n", weights_path=str(tmp_path / "nope.msgpack"))
    with pytest.raises(FileNotFoundError):
        resolve_reid_params(weights_path=str(tmp_path / "nope.onnx"))
    with pytest.raises(ValueError, match="unsupported"):
        resolve_yolo_params("n", weights_path=str(tmp_path / "w.engine"))
    # .xlae artifacts are engines, not weight files — direct to the facades
    eng = tmp_path / "det.xlae"
    eng.write_bytes(b"AICAMXLAE1")
    with pytest.raises(ValueError, match="YOLODetector"):
        resolve_yolo_params("n", weights_path=str(eng))
    with pytest.raises(ValueError, match="ReIDModel"):
        resolve_reid_params(weights_path=str(eng))
