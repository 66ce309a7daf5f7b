"""StrongSORT-style EMA appearance bank (TrackerParams.ema_alpha > 0).

The EMA gallery is this framework's implementation of the "smarter gallery
management in ReID" item on the reference's future-enhancements list
(reference README.md). Reference-parity behavior (the FIFO feature ring,
track.py:70-74) is the default and is covered by the existing suites; these
tests pin the EMA semantics against a NumPy oracle and check the facade
plumbing.
"""

import numpy as np
import pytest

from aicamera_tpu.core import (TrackerParams, init_state, make_detections,
                               predict, update)
from aicamera_tpu.core.state import CONFIRMED
from aicamera_tpu.core.tracker import get_outputs

ALPHA = 0.9
EMA_PARAMS = TrackerParams(max_tracks=16, max_detections=8, nn_budget=1,
                           feature_dim=16, n_init=3, max_age=5,
                           ema_alpha=ALPHA)


def unit_feature(seed, dim=16):
    rng = np.random.RandomState(seed)
    f = rng.rand(dim).astype(np.float32)
    return f / np.linalg.norm(f)


def step(s, boxes, feats=None, params=EMA_PARAMS):
    s = predict(s, params)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    confs = np.full(n, 0.9, np.float32)
    class_ids = np.zeros(n, np.int32)
    feats = None if feats is None else np.asarray(feats, np.float32)
    d = make_detections(boxes, confs, class_ids, feats, params=params)
    return update(s, d, params)


def ema_oracle(features, alpha=ALPHA):
    """NumPy recursion: e0 = normalize(f0); e = normalize(a*e + (1-a)*f̂)."""
    e = None
    for f in features:
        f = f / max(np.linalg.norm(f), 1e-7)
        if e is None:
            e = f
        else:
            e = alpha * e + (1.0 - alpha) * f
            e = e / max(np.linalg.norm(e), 1e-7)
    return e


def test_params_validation():
    with pytest.raises(ValueError):
        TrackerParams(ema_alpha=1.0)
    with pytest.raises(ValueError):
        TrackerParams(ema_alpha=-0.1)
    TrackerParams(ema_alpha=0.0)  # FIFO default is fine


def test_ema_bank_matches_numpy_oracle():
    # One track matched across 8 frames with varying (non-unit) features.
    rng = np.random.RandomState(0)
    feats = [rng.rand(16).astype(np.float32) * (0.5 + i) for i in range(8)]
    s = init_state(EMA_PARAMS)
    for i, f in enumerate(feats):
        s = step(s, [[10 + i, 10 + i, 20, 40]], [f])
    slot = int(np.flatnonzero(np.asarray(s.active))[0])
    got = np.asarray(s.gallery)[slot, 0]
    want = ema_oracle(feats)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # the bank is a single normalized embedding: count stays 1
    assert int(np.asarray(s.gallery_count)[slot]) == 1
    assert abs(float(np.linalg.norm(got)) - 1.0) < 1e-5


def test_ema_bank_is_normalized_even_for_unnormalized_seeds():
    s = init_state(EMA_PARAMS)
    raw = np.full(16, 3.0, np.float32)  # ||raw|| = 12
    s = step(s, [[10, 10, 20, 40]], [raw])
    slot = int(np.flatnonzero(np.asarray(s.active))[0])
    seed = np.asarray(s.gallery)[slot, 0]
    assert abs(float(np.linalg.norm(seed)) - 1.0) < 1e-5


def test_ema_tracking_preserves_ids_across_feature_noise():
    """Two crossing-free objects with noisy per-frame features keep their
    IDs under the EMA bank (the bank should smooth the noise)."""
    rng = np.random.RandomState(42)
    base_a, base_b = unit_feature(1), unit_feature(2)
    s = init_state(EMA_PARAMS)
    for i in range(10):
        fa = base_a + 0.05 * rng.randn(16).astype(np.float32)
        fb = base_b + 0.05 * rng.randn(16).astype(np.float32)
        s = step(s, [[10 + 2 * i, 10, 20, 40], [200 - 2 * i, 100, 20, 40]],
                 [fa, fb])
    tlbr, ids, cls, conf, mask = get_outputs(s)
    m = np.asarray(mask)
    assert m.sum() == 2
    got_ids = sorted(np.asarray(ids)[m].tolist())
    assert got_ids == [1, 2]
    st = np.asarray(s.state)[np.asarray(s.active)]
    assert (st == CONFIRMED).all()


def test_ema_appearance_rematch_after_occlusion():
    """A confirmed track missed for several frames is recovered by
    appearance through the cascade using its EMA embedding."""
    f = unit_feature(7)
    s = init_state(EMA_PARAMS)
    for i in range(3):
        s = step(s, [[50, 50, 20, 40]], [f])
    # occlusion: 3 missed frames (< max_age)
    for _ in range(3):
        s = step(s, np.zeros((0, 4)))
    before_ids = np.asarray(s.track_id)[np.asarray(s.active)].tolist()
    assert before_ids == [1]
    # reappears near the predicted location with a similar feature
    s = step(s, [[52, 52, 20, 40]], [f + 0.01])
    tlbr, ids, cls, conf, mask = get_outputs(s)
    m = np.asarray(mask)
    assert m.sum() == 1
    assert int(np.asarray(ids)[m][0]) == 1  # same identity, no new track


def test_facade_ema_kwargs():
    from aicamera_tpu.tracker_api import DeepSORT
    t = DeepSORT(gallery_strategy="ema", ema_alpha=0.8)
    assert t.params.ema_alpha == 0.8
    assert t.params.nn_budget == 1
    with pytest.raises(ValueError):
        DeepSORT(gallery_strategy="bogus")
    with pytest.raises(ValueError):
        DeepSORT(gallery_strategy="ema", ema_alpha=1.5)


@pytest.mark.parametrize("seed", range(3))
def test_ema_sliced_core_equals_full_core(seed):
    """Capacity slicing (scan_bucket) must carry the EMA bank bitwise:
    the first T_SMALL slots of a full-capacity EMA run equal the sliced
    run exactly (the blended gallery write lands in sliced rows)."""
    import dataclasses
    from aicamera_tpu.core.state import slice_tracks
    from test_scan_bucket_impl import P_FULL, T_SMALL, _step, _tree_equal
    from test_tracker_differential import random_frames
    p_full = dataclasses.replace(P_FULL, nn_budget=1, ema_alpha=ALPHA)
    p_small = dataclasses.replace(p_full, max_tracks=T_SMALL)
    s_full = init_state(p_full)
    s_small = init_state(p_small)
    for dets in random_frames(seed):
        s_full = _step(s_full, dets, p_full)
        s_small = _step(s_small, dets, p_small)
        assert not np.any(np.asarray(s_full.active)[T_SMALL:])
        _tree_equal(slice_tracks(s_full, T_SMALL), s_small)


def test_fifo_default_unchanged():
    """ema_alpha=0 keeps the reference FIFO ring: gallery_count grows and
    entries are the raw features."""
    params = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                           feature_dim=16, n_init=3, max_age=5)
    rng = np.random.RandomState(3)
    feats = [rng.rand(16).astype(np.float32) for _ in range(3)]
    s = init_state(params)
    for i, f in enumerate(feats):
        s = step(s, [[10 + i, 10 + i, 20, 40]], [f], params=params)
    slot = int(np.flatnonzero(np.asarray(s.active))[0])
    assert int(np.asarray(s.gallery_count)[slot]) == 3
    gal = np.asarray(s.gallery)[slot]
    for i, f in enumerate(feats):
        np.testing.assert_allclose(gal[i], f, rtol=1e-6)
