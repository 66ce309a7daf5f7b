"""BoT-SORT appearance fusion on the ByteTrack core.

Pins the with_appearance=True semantics (Aharon et al. 2022 — min(IoU, emb)
fused association with proximity/appearance masking, EMA feature bank)
against NumPy oracles and a deterministic identity-swap scenario that
motion-only ByteTrack provably gets wrong.
"""

import numpy as np
import pytest

from aicamera_tpu.core import bytetrack as bt

BOX = np.array([0.0, 50.0, 60.0, 60.0], np.float32)  # tlwh template, w=60


def _params(**kw):
    kw.setdefault("max_tracks", 16)
    kw.setdefault("max_detections", 8)
    kw.setdefault("with_appearance", True)
    kw.setdefault("feature_dim", 8)
    return bt.ByteTrackParams(**kw)


def _dets(p, boxes_tlwh, scores, feats=None):
    boxes_tlwh = np.asarray(boxes_tlwh, np.float32).reshape(-1, 4)
    n = len(boxes_tlwh)
    return bt.make_detections(
        boxes_tlwh, np.asarray(scores, np.float32), np.zeros(n, np.int32),
        feature=feats, params=p)


def _active_ids_by_x(state):
    """Track ids of activated TRACKED tracks, ordered by center x."""
    tlbr, ids, _, _, mask = map(np.asarray, bt.get_outputs(state))
    m = mask
    cx = (tlbr[m][:, 0] + tlbr[m][:, 2]) / 2
    return ids[m][np.argsort(cx)].tolist()


def test_motion_only_state_has_no_feature_bank():
    p = bt.ByteTrackParams(max_tracks=16, max_detections=8)
    s = bt.init_state(p)
    assert s.feat is None and s.has_feat is None
    d = bt.make_detections(BOX[None], np.array([0.9], np.float32),
                           np.zeros(1, np.int32), params=p)
    assert d.feature is None and d.has_feature is None
    s = bt.step(s, d, p)
    assert s.feat is None and s.has_feat is None


def test_feature_bank_seed_and_ema_matches_oracle():
    p = _params(feat_ema_alpha=0.9)
    s = bt.init_state(p)
    rng = np.random.RandomState(3)
    f0, f1, f2 = [rng.rand(8).astype(np.float32) for _ in range(3)]

    def norm(v):
        return v / np.linalg.norm(v)

    box = BOX.copy()
    for f in (f0, f1, f2):
        s = bt.step(s, _dets(p, box[None], [0.9], f[None]), p)
        box = box + np.array([3, 0, 0, 0], np.float32)

    # oracle: seed with normalized f0, then EMA-blend f1, f2
    e = norm(f0)
    for f in (f1, f2):
        e = norm(0.9 * e + 0.1 * norm(f))
    slot = int(np.flatnonzero(np.asarray(s.active))[0])
    np.testing.assert_allclose(np.asarray(s.feat)[slot], e,
                               rtol=1e-5, atol=1e-5)
    assert bool(np.asarray(s.has_feat)[slot])


def test_detection_without_feature_keeps_bank_and_matches_by_iou():
    p = _params()
    s = bt.init_state(p)
    f = np.eye(8, dtype=np.float32)[0][None]
    s = bt.step(s, _dets(p, BOX[None], [0.9], f), p)
    bank0 = np.asarray(s.feat).copy()
    # matched update with NO feature: bank unchanged, track still updates
    s = bt.step(s, _dets(p, (BOX + [3, 0, 0, 0])[None], [0.9]), p)
    assert int(np.asarray(s.active).sum()) == 1
    assert int(np.asarray(s.tsu)[np.asarray(s.active)][0]) == 0
    np.testing.assert_array_equal(np.asarray(s.feat), bank0)


def _bounce_scenario(with_appearance):
    """Two objects approach, then bounce back exactly onto each other's
    Kalman-predicted positions. Motion-only association provably swaps
    the ids at the bounce; the appearance term keeps them."""
    p = _params() if with_appearance else bt.ByteTrackParams(
        max_tracks=16, max_detections=8)
    s = bt.init_state(p)
    fa = np.eye(8, dtype=np.float32)[0]
    fb = np.eye(8, dtype=np.float32)[1]
    xa, xb, v = 20.0, 180.0, 8.0
    for i in range(11):  # approach until the boxes interleave at the middle
        boxes = np.stack([
            np.array([xa, 50, 60, 60], np.float32),
            np.array([xb, 50, 60, 60], np.float32)])
        feats = np.stack([fa, fb]) if with_appearance else None
        s = bt.step(s, _dets(p, boxes, [0.9, 0.9], feats), p)
        xa += v
        xb -= v
    # bounce: each object reverses; its new position is ~the OTHER
    # object's straight-line prediction
    xa -= 2 * v
    xb += 2 * v
    boxes = np.stack([
        np.array([xa, 50, 60, 60], np.float32),
        np.array([xb, 50, 60, 60], np.float32)])
    feats = np.stack([fa, fb]) if with_appearance else None
    s = bt.step(s, _dets(p, boxes, [0.9, 0.9], feats), p)
    return _active_ids_by_x(s)


def test_bounce_swaps_ids_for_motion_only_but_not_botsort():
    # before the bounce both trackers have id 1 left, id 2 right
    assert _bounce_scenario(with_appearance=False) == [2, 1]  # swapped
    assert _bounce_scenario(with_appearance=True) == [1, 2]   # rescued


def test_appearance_beyond_threshold_falls_back_to_iou():
    """A matched detection whose feature is totally different (cos dist
    1/2 = 0.5 > appearance_thresh) must still match through the IoU
    term — the emb mask only removes the appearance shortcut."""
    p = _params()
    s = bt.init_state(p)
    f = np.eye(8, dtype=np.float32)
    s = bt.step(s, _dets(p, BOX[None], [0.9], f[0][None]), p)
    s = bt.step(s, _dets(p, (BOX + [2, 0, 0, 0])[None], [0.9],
                         f[1][None]), p)
    tlbr, ids, _, _, mask = map(np.asarray, bt.get_outputs(s))
    assert mask.sum() == 1 and ids[mask][0] == 1
    # and the orthogonal feature was still EMA-blended in (matched update)
    slot = int(np.flatnonzero(np.asarray(s.active))[0])
    e = f[0] / np.linalg.norm(f[0])
    e = 0.9 * e + 0.1 * f[1] / np.linalg.norm(f[1])
    e = e / np.linalg.norm(e)
    np.testing.assert_allclose(np.asarray(s.feat)[slot], e,
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# pipeline / facade surfaces
# ---------------------------------------------------------------------------

FRAME_HW = (96, 128)


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (*FRAME_HW, 3), np.uint8) for _ in range(n)]


def test_botsort_pipeline_runs_deterministically():
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    bp = bt.ByteTrackParams(max_tracks=16, max_detections=8,
                            with_appearance=True, feature_dim=512)
    pipe = TrackingPipeline(chunk_size=4, input_shape=(128, 128),
                            tracker="botsort", bytetrack_params=bp,
                            max_reid_crops=4)
    assert pipe.with_reid is True
    assert pipe._nms_score_floor == bp.low_thresh
    results = list(pipe.process_frames(iter(_frames(8, seed=3))))
    assert [r.frame_index for r in results] == list(range(8))
    pipe.reset()
    again = list(pipe.process_frames(iter(_frames(8, seed=3))))
    for a, b in zip(results, again):
        assert a.tracks == b.tracks
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)


def test_botsort_pipeline_validation():
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    plain = bt.ByteTrackParams(max_tracks=16, max_detections=8)
    with pytest.raises(ValueError, match="with_appearance"):
        TrackingPipeline(tracker="botsort", bytetrack_params=plain)
    app = bt.ByteTrackParams(max_tracks=16, max_detections=8,
                             with_appearance=True)
    with pytest.raises(ValueError, match="botsort"):
        TrackingPipeline(tracker="bytetrack", bytetrack_params=app)
    with pytest.raises(ValueError, match="nsa"):
        TrackingPipeline(tracker="botsort", nsa=True)


def test_botsort_facade_lifecycle():
    from aicamera_tpu.botsort_api import BoTSORT

    t = BoTSORT(max_tracks=16, max_detections=8)
    assert t.params.with_appearance is True
    frame = np.zeros((120, 160, 3), np.uint8)
    frame[20:100, 30:90] = 128
    box = np.array([[30.0, 20.0, 90.0, 100.0]], np.float32)
    out1 = t.update(box, np.array([0.9]), np.array([0]), frame)
    # frame-1 tracks activate immediately (official BYTE/BoT-SORT rule)
    assert len(out1) == 1 and out1[0][4] == 1
    out2 = t.update(box + 3, np.array([0.9]), np.array([0]), frame)
    assert len(out2) == 1 and out2[0][4] == 1
    # miss then reacquire keeps the id
    t.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), frame)
    out4 = t.update(box + 6, np.array([0.9]), np.array([0]), frame)
    assert len(out4) == 1 and out4[0][4] == 1
    assert isinstance(t.get_active_tracks(), list)
    t.reset()
    assert t.frame_count == 0


def test_botsort_multistream_streams_are_independent():
    """Two streams fed identical frames must produce identical outputs
    (per-stream state under vmap; no cross-stream leakage), and the
    embed stage must be active (with_reid)."""
    from aicamera_tpu.parallel import MultiStreamPipeline

    pipe = MultiStreamPipeline(n_streams=2, frame_hw=FRAME_HW,
                               tracker="botsort")
    rng = np.random.RandomState(5)
    one = rng.randint(0, 256, (3, *FRAME_HW, 3), np.uint8)
    frames = np.stack([one, one])  # (S=2, K=3, H, W, 3)
    outs = pipe.step_chunk(frames)
    for o in outs:
        a = np.asarray(o)
        np.testing.assert_array_equal(a[0], a[1])


def test_lost_track_revival_updates_bank():
    p = _params(track_thresh=0.5)
    s = bt.init_state(p)
    f = np.eye(8, dtype=np.float32)
    s = bt.step(s, _dets(p, BOX[None], [0.9], f[0][None]), p)
    s = bt.step(s, _dets(p, (BOX + [2, 0, 0, 0])[None], [0.9],
                         f[0][None]), p)
    # miss two frames -> LOST
    for _ in range(2):
        s = bt.step(s, _dets(p, np.zeros((0, 4)), []), p)
    assert int(np.asarray(s.state)[np.asarray(s.active)][0]) == bt.LOST
    bank0 = np.asarray(s.feat).copy()
    # revive with a blended-feature detection
    s = bt.step(s, _dets(p, (BOX + [8, 0, 0, 0])[None], [0.9],
                         f[1][None]), p)
    a = np.asarray(s.active)
    assert int(np.asarray(s.state)[a][0]) == bt.TRACKED
    assert not np.array_equal(np.asarray(s.feat), bank0)
