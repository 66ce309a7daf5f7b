"""Deep OC-SORT (core/ocsort.py with_appearance=True): adaptive-weight
oracle, dynamic-alpha EMA semantics, appearance-resolved association, and
the facade surface."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicamera_tpu.core import ocsort as oc
from aicamera_tpu.core.ocsort import (OCSortParams, _aw_weight_matrix,
                                      init_state, make_detections, step,
                                      xyxy_to_z)

P = OCSortParams(det_thresh=0.4, min_hits=1, max_tracks=8,
                 max_detections=4, with_appearance=True, feature_dim=4)


def _aw_official(emb_cost, w_assoc, bottom):
    """The official Deep-OC-SORT compute_aw_max_metric (double loop)."""
    w_emb = np.full_like(emb_cost, w_assoc)
    for idx in range(emb_cost.shape[0]):
        inds = np.argsort(-emb_cost[idx])
        if len(inds) < 2:
            continue
        if emb_cost[idx, inds[0]] == 0:
            row_weight = 0.0
        else:
            row_weight = 1.0 - max(
                (emb_cost[idx, inds[1]] / emb_cost[idx, inds[0]]) - bottom,
                0.0) / (1.0 - bottom)
        w_emb[idx] *= row_weight
    for idj in range(emb_cost.shape[1]):
        inds = np.argsort(-emb_cost[:, idj])
        if len(inds) < 2:
            continue
        if emb_cost[inds[0], idj] == 0:
            col_weight = 0.0
        else:
            col_weight = 1.0 - max(
                (emb_cost[inds[1], idj] / emb_cost[inds[0], idj]) - bottom,
                0.0) / (1.0 - bottom)
        w_emb[:, idj] *= col_weight
    return w_emb


def test_aw_weights_match_official_oracle():
    rng = np.random.default_rng(0)
    for case in range(20):
        t, n = rng.integers(2, 7), rng.integers(2, 6)
        sim = rng.uniform(0.0, 1.0, (t, n)).astype(np.float32)
        # zero entries (the iou<=0 gating) incl. whole rows/columns
        sim[rng.uniform(size=(t, n)) < 0.3] = 0.0
        if case % 3 == 0:
            sim[0, :] = 0.0
        want = _aw_official(sim, 0.75, 0.5)
        got = np.asarray(_aw_weight_matrix(
            jnp.asarray(sim), jnp.ones((t,), bool), jnp.ones((n,), bool),
            0.75, 0.5))
        np.testing.assert_allclose(got, want, atol=1e-6), f"case {case}"


def test_aw_weights_masking_matches_official_on_submatrix():
    """Masked (padded) rows/cols must not perturb the real submatrix's
    weights — the official computes on the dense real matrix only."""
    rng = np.random.default_rng(1)
    sim_real = rng.uniform(0.0, 1.0, (3, 4)).astype(np.float32)
    want = _aw_official(sim_real, 0.5, 0.5)
    sim_pad = np.zeros((6, 7), np.float32)
    sim_pad[:3, :4] = sim_real
    # poison the padding with large values; the mask must exclude them
    sim_pad[3:, :] = 5.0
    sim_pad[:, 4:] = 5.0
    rows = np.array([True] * 3 + [False] * 3)
    cols = np.array([True] * 4 + [False] * 3)
    got = np.asarray(_aw_weight_matrix(
        jnp.asarray(sim_pad), jnp.asarray(rows), jnp.asarray(cols),
        0.5, 0.5))[:3, :4]
    np.testing.assert_allclose(got, want, atol=1e-6)


def _det(boxes, confs, clss, feats=None, params=P):
    feats = None if feats is None else np.asarray(feats, np.float32)
    return make_detections(np.asarray(boxes, np.float32),
                           np.asarray(confs, np.float32),
                           np.asarray(clss, np.int32),
                           feature=feats, params=params)


E1 = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
E2 = np.array([0.0, 1.0, 0.0, 0.0], np.float32)


def test_initiation_seeds_bank_and_dynamic_alpha_ema():
    s = init_state(P)
    box = np.array([[10.0, 10.0, 40.0, 70.0]])
    s = step(s, _det(box, [0.9], [0], [E1]), P)
    # initiation: bank = raw detection embedding
    np.testing.assert_allclose(np.asarray(s.emb)[0], E1, atol=1e-6)

    conf = 0.7
    f2 = np.array([0.0, 0.0, 1.0, 0.0], np.float32)
    s = step(s, _det(box + 2, [conf], [0], [f2]), P)
    trust = (conf - P.det_thresh) / (1 - P.det_thresh)
    alpha = P.alpha_fixed_emb + (1 - P.alpha_fixed_emb) * (1 - trust)
    want = alpha * E1 + (1 - alpha) * f2
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(np.asarray(s.emb)[0], want, atol=1e-5)


def test_featureless_match_leaves_bank_unchanged():
    s = init_state(P)
    box = np.array([[10.0, 10.0, 40.0, 70.0]])
    s = step(s, _det(box, [0.9], [0], [E1]), P)
    s = step(s, _det(box + 2, [0.9], [0], [np.zeros(4, np.float32)]), P)
    np.testing.assert_allclose(np.asarray(s.emb)[0], E1, atol=1e-6)


def _two_track_state(emb0, emb1):
    """Two active tracks at the SAME location with distinct banks —
    any IoU-based association is perfectly ambiguous."""
    s = init_state(P)
    box = jnp.asarray([[20.0, 20.0, 60.0, 80.0]] * 2, jnp.float32)
    x, p = oc.kf_initiate(xyxy_to_z(box))
    return s.replace(
        active=s.active.at[:2].set(True),
        x=s.x.at[:2].set(x), p=s.p.at[:2].set(p),
        track_id=s.track_id.at[:2].set(jnp.asarray([1, 2])),
        emb=s.emb.at[0].set(jnp.asarray(emb0)).at[1].set(jnp.asarray(emb1)),
        next_id=jnp.int32(3),
    )


def test_appearance_resolves_ambiguous_association():
    """Both tracks and both detections share one location (tied IoU, no
    momentum): the adaptively weighted cosine term must route each
    detection to the track whose bank matches its feature, in both
    orderings."""
    box = np.array([[20.0, 20.0, 60.0, 80.0]] * 2)
    for d_feats, want_cls in (([E1, E2], [7, 9]), ([E2, E1], [9, 7])):
        s = _two_track_state(E1, E2)
        s2 = step(s, _det(box, [0.9, 0.9], [7, 9], d_feats), P)
        got = np.asarray(s2.class_id)[:2]
        np.testing.assert_array_equal(got, want_cls)


def test_motion_only_mode_has_no_appearance_state():
    p_off = dataclasses.replace(P, with_appearance=False)
    s = init_state(p_off)
    assert s.emb is None
    d = make_detections(np.array([[10.0, 10.0, 40.0, 70.0]]),
                        np.array([0.9]), np.array([0]), params=p_off)
    assert d.feature is None and d.has_feature is None
    s = step(s, d, p_off)
    assert s.emb is None and bool(np.asarray(s.active)[0])


def test_checkpoint_roundtrip_with_appearance(tmp_path):
    from aicamera_tpu.runtime.checkpoint import load_state, save_state
    s = init_state(P)
    box = np.array([[10.0, 10.0, 40.0, 70.0]])
    s = step(s, _det(box, [0.9], [0], [E1]), P)
    path = tmp_path / "deepocsort.msgpack"
    save_state(path, s)
    back = load_state(path, P)
    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (96, 128, 3), np.uint8) for _ in range(n)]


def test_deepocsort_pipeline_runs_deterministically():
    from aicamera_tpu import config
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    op = dataclasses.replace(P, det_thresh=0.25, max_tracks=16,
                             max_detections=8, feature_dim=512)
    pipe = TrackingPipeline(chunk_size=4, input_shape=(128, 128),
                            tracker="deepocsort", ocsort_params=op,
                            max_reid_crops=4)
    assert pipe.with_reid is True
    # det_thresh below the NMS default must lower the floor (same rule
    # as plain ocsort)
    assert pipe._nms_score_floor == min(config.YOLO_NMS_SCORE_THRESHOLD,
                                        op.det_thresh)
    results = list(pipe.process_frames(iter(_frames(8, seed=3))))
    assert [r.frame_index for r in results] == list(range(8))
    pipe.reset()
    again = list(pipe.process_frames(iter(_frames(8, seed=3))))
    for a, b in zip(results, again):
        assert a.tracks == b.tracks
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)


def test_deepocsort_pipeline_validation():
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    plain = dataclasses.replace(P, with_appearance=False)
    with pytest.raises(ValueError, match="with_appearance"):
        TrackingPipeline(tracker="deepocsort", ocsort_params=plain)
    with pytest.raises(ValueError, match="deepocsort"):
        TrackingPipeline(tracker="ocsort", ocsort_params=P)
    with pytest.raises(ValueError, match="nsa"):
        TrackingPipeline(tracker="deepocsort", nsa=True)


def test_facade_surface_and_lifecycle():
    from aicamera_tpu.deepocsort_api import DeepOCSort
    tr = DeepOCSort(min_hits=2, max_tracks=16, max_detections=8,
                    max_reid_crops=4)
    frame = np.zeros((96, 128, 3), np.uint8)
    frame[30:80, 20:60] = 150
    box = np.array([[20.0, 30.0, 60.0, 80.0]], np.float32)
    out1 = tr.update(box, np.array([0.9]), np.array([0]), frame)
    assert len(out1) == 1 and out1[0][4] == 1
    out2 = tr.update(box + 2, np.array([0.9]), np.array([0]), frame)
    assert len(out2) == 1 and out2[0][4] == 1
    assert tr.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0),
                     frame) == []
    out4 = tr.update(box + 8, np.array([0.9]), np.array([0]), frame)
    assert all(t[4] == 1 for t in out4)
    tr.reset()
    assert tr.frame_count == 0


def test_deepocsort_multistream_sharded_matches_single():
    """Deep OC-SORT as a vmapped multi-stream tracker step: the stream-
    sharded run (EMA bank + AW matrices under vmap + shard_map) must match
    the unsharded single-device run bitwise, identical frames on both
    streams must yield identical per-stream outputs, and the crop/embed
    stage must be active (with_appearance)."""
    from aicamera_tpu.parallel import MultiStreamPipeline, make_stream_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ virtual devices")
    op = OCSortParams(det_thresh=0.25, min_hits=1, max_tracks=16,
                      max_detections=8, with_appearance=True,
                      feature_dim=512)
    base = dict(n_streams=2, frame_hw=(96, 128), input_shape=(128, 128),
                tracker="deepocsort", ocsort_params=op)
    rng = np.random.RandomState(7)
    one = rng.randint(0, 256, (2, 96, 128, 3), np.uint8)  # (K, H, W, 3)
    frames = np.stack([one, one])                         # both streams equal

    sharded = MultiStreamPipeline(mesh=make_stream_mesh(2), **base)
    outs = jax.device_get(sharded.step_chunk(frames))

    single = MultiStreamPipeline(**base)
    outs1 = jax.device_get(single.step_chunk(frames))

    for a, b in zip(outs, outs1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(jax.device_get(sharded.states)),
                    jax.tree.leaves(jax.device_get(single.states))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # identical frames -> identical independent per-stream results
    for a in outs:
        np.testing.assert_array_equal(np.asarray(a)[0], np.asarray(a)[1])
    # the appearance state (EMA bank) exists in the multistream state tree
    assert sharded.states.emb is not None
