"""Differential oracle: the JAX tracker vs the REFERENCE's actual core.

The reference's tracking layer (/root/reference/src/tracker/core) is pure
NumPy/SciPy and hardware-free, so it can be imported and executed directly
(reference tracker_core.py:18-81, track.py:23-119, linear_assignment.py:19-157).
Unlike test_tracker_differential.py — which validates against an independent
*reimplementation* of the reference semantics — this drives the reference's
own TrackerCore through the same randomized multi-frame scenes plus the
golden occlusion scene and asserts, frame by frame:

  * identical emitted track ids and (near-identical) boxes for the output
    set (confirmed tracks with time_since_update == 0), and
  * identical full lifecycle state for every live track:
    (track_id, TrackState, time_since_update, hits).

Any misreading of the reference (cascade tie-breaks, gating order, revive
semantics, IoU-stage eligibility) fails here even if the reimplementation
test passes.
"""

import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

from src.tracker.core.detection import Detection as RefDetection  # noqa: E402
from src.tracker.core.tracker_core import TrackerCore  # noqa: E402

from aicamera_tpu.core import (TrackerParams, init_state,  # noqa: E402
                               make_detections, predict, update)
from aicamera_tpu.core.tracker import get_outputs  # noqa: E402

# Same scene generator + params as the reimplementation differential test,
# so a divergence isolates to semantics rather than inputs.
from test_tracker_differential import P, random_frames  # noqa: E402


def make_reference_tracker(p: TrackerParams) -> TrackerCore:
    return TrackerCore(
        max_cosine_distance=p.max_cosine_distance,
        nn_budget=p.nn_budget,
        max_iou_distance=p.max_iou_distance,
        max_age=p.max_age,
        n_init=p.n_init,
    )


def reference_step(core, dets):
    """One reference predict+update over [(tlwh, feat_or_None), ...]."""
    core.predict()
    core.update([RefDetection(tlwh, 0.9, "person", feat)
                 for tlwh, feat in dets])


def reference_outputs(core):
    out = []
    for t in core.tracks:
        if t.is_confirmed() and t.time_since_update == 0:
            b = t.to_tlwh()
            out.append((t.track_id, b[0], b[1], max(b[2], 0.0),
                        max(b[3], 0.0)))
    return sorted(out)


def reference_lifecycle(core):
    return sorted((t.track_id, int(t.state), t.time_since_update, t.hits)
                  for t in core.tracks)


def jax_step(s, dets, p):
    n = len(dets)
    tlwh_arr = np.zeros((max(n, 1), 4), np.float32)
    feats = np.zeros((max(n, 1), p.feature_dim), np.float32)
    hasf = np.zeros((max(n, 1),), bool)
    for j, (tlwh, feat) in enumerate(dets):
        tlwh_arr[j] = tlwh
        if feat is not None:
            feats[j] = feat
            hasf[j] = True
    valid = np.zeros((max(n, 1),), bool)
    valid[:n] = True
    s = predict(s, p)
    d = make_detections(tlwh_arr, np.full(max(n, 1), 0.9, np.float32),
                        np.zeros(max(n, 1), np.int32), feats,
                        has_feature=hasf, valid=valid, params=p)
    return update(s, d, p)


def jax_outputs(s):
    tlbr, ids, cls, conf, mask = get_outputs(s)
    m = np.asarray(mask)
    return sorted(
        (int(i), b[0], b[1], max(b[2] - b[0], 0.0), max(b[3] - b[1], 0.0))
        for i, b in zip(np.asarray(ids)[m], np.asarray(tlbr)[m]))


def jax_lifecycle(s):
    active = np.asarray(s.active)
    return sorted(zip(np.asarray(s.track_id)[active].tolist(),
                      np.asarray(s.state)[active].tolist(),
                      np.asarray(s.tsu)[active].tolist(),
                      np.asarray(s.hits)[active].tolist()))


def assert_frames_match(frames, p, box_atol=0.5):
    core = make_reference_tracker(p)
    s = init_state(p)
    for fi, dets in enumerate(frames):
        reference_step(core, dets)
        s = jax_step(s, dets, p)

        ref = reference_outputs(core)
        ours = jax_outputs(s)
        assert [o[0] for o in ours] == [r[0] for r in ref], (
            f"frame {fi}: emitted ids {[o[0] for o in ours]} vs reference "
            f"{[r[0] for r in ref]}")
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(
                o[1:], r[1:], rtol=1e-3, atol=box_atol,
                err_msg=f"frame {fi} track {o[0]}")

        assert jax_lifecycle(s) == reference_lifecycle(core), (
            f"frame {fi}: lifecycle diverged\n"
            f"  ours: {jax_lifecycle(s)}\n  ref : {reference_lifecycle(core)}")


@pytest.mark.parametrize("seed", range(20))
def test_randomized_scenes_match_reference_core(seed):
    assert_frames_match(random_frames(seed), P)


def test_golden_occlusion_scene_matches_reference_core():
    """Three objects, one occluded for 8 frames (same scene as the golden
    MOT regression): the reference must agree on ids through the
    reappearance (cascade level tsu==8 re-match)."""
    p = TrackerParams(max_tracks=32, max_detections=16, nn_budget=10,
                      feature_dim=32, n_init=3, max_age=30)

    def unit_feature(seed):
        rng = np.random.RandomState(seed)
        f = rng.rand(p.feature_dim).astype(np.float32)
        return f / np.linalg.norm(f)

    objs = {
        1: (unit_feature(1), lambda t: [50 + 6 * t, 100, 40, 80]),
        2: (unit_feature(2), lambda t: [400 - 6 * t, 110, 42, 78]),
        3: (unit_feature(3), lambda t: [220, 30 + 4 * t, 36, 70]),
    }
    frames = []
    for t in range(40):
        dets = []
        for oid, (feat, traj) in objs.items():
            if oid == 3 and 15 <= t < 23:
                continue
            dets.append((np.array(traj(t), np.float32), feat))
        frames.append(dets)
    assert_frames_match(frames, p)


def test_empty_frames_lifecycle_matches_reference_core():
    """Confirm, then starve: deletion timing (tsu > max_age) must match."""
    p = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                      feature_dim=8, n_init=3, max_age=5)
    feat = np.ones(p.feature_dim, np.float32) / np.sqrt(p.feature_dim)
    box = np.array([100, 100, 40, 80], np.float32)
    frames = [[(box, feat)]] * 4 + [[]] * 8
    assert_frames_match(frames, p)


def test_deep_cascade_level_revival_matches_reference_core():
    """Occlusions deep in the cascade (levels 25 and beyond max_age):
    a track missed 25 frames must re-match by appearance at cascade
    level tsu==25 with the SAME id; one missed past max_age=30 must be
    deleted and come back as a NEW id. Exercises level compaction far
    above the ~8-level range of the other scenes (reference
    linear_assignment.py:91-157 runs one round per level)."""
    p = TrackerParams(max_tracks=32, max_detections=16, nn_budget=10,
                      feature_dim=32, n_init=3, max_age=30)

    def unit_feature(seed):
        rng = np.random.RandomState(seed)
        f = rng.rand(p.feature_dim).astype(np.float32)
        return f / np.linalg.norm(f)

    f_a, f_b, f_c = (unit_feature(s) for s in (11, 12, 13))
    frames = []
    for t in range(75):
        dets = []
        # anchor object, always present (keeps the update loop non-trivial)
        dets.append((np.array([60 + 2 * t, 300, 40, 80], np.float32), f_a))
        # B: confirmed by t=5, occluded t in [6, 31) -> 25 misses,
        # reappears stationary (KF velocity ~0, gate inflated) at t=31
        if t < 6 or t >= 31:
            dets.append((np.array([250, 100, 44, 84], np.float32), f_b))
        # C: confirmed by t=5, occluded t in [6, 38) -> 32 misses
        # > max_age=30 -> deleted at t=37; reappears t=38 as a new id
        if t < 6 or t >= 38:
            dets.append((np.array([420, 200, 38, 76], np.float32), f_c))
        frames.append(dets)
    assert_frames_match(frames, p)
