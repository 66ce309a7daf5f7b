"""NSA (noise-scale-adaptive) Kalman updates — StrongSORT's eq. 8.

The reference DeepSORT has a fixed measurement-noise model
(``src/tracker/core/kalman_filter.py:122-151``); NSA scales it by
``(1 - detection_confidence)`` at update time. These tests pin:

- the off path is bitwise the reference-parity update,
- confidence=0 is exactly the fixed-noise update,
- higher confidence pulls the posterior harder toward the measurement,
- confidence=1 collapses measurement noise to zero (posterior == measurement
  in the observed dims),
- the tracker core / facade / pipeline surfaces accept and gate the flag.
"""

import numpy as np
import pytest

from aicamera_tpu.core import (TrackerParams, init_state, make_detections,
                               predict, update)
from aicamera_tpu.core import kalman
from aicamera_tpu.core.tracker import get_outputs


def _one_track():
    mean, cov = kalman.initiate(np.array([100.0, 80.0, 0.5, 40.0], np.float32))
    # a predict step inflates covariance so the update has work to do
    return kalman.predict(mean, cov)


MEAS = np.array([112.0, 90.0, 0.55, 44.0], np.float32)


def test_confidence_zero_equals_fixed_noise_update():
    mean, cov = _one_track()
    m0, c0 = kalman.update(mean, cov, MEAS)
    m1, c1 = kalman.update(mean, cov, MEAS, confidence=np.float32(0.0))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_higher_confidence_moves_posterior_toward_measurement():
    mean, cov = _one_track()
    dists = []
    for conf in (0.0, 0.5, 0.9, 0.99):
        m, _ = kalman.update(mean, cov, MEAS, confidence=np.float32(conf))
        dists.append(float(np.linalg.norm(np.asarray(m)[:4] - MEAS)))
    assert dists == sorted(dists, reverse=True), dists
    assert dists[-1] < dists[0]


def test_confidence_one_trusts_measurement_fully():
    mean, cov = _one_track()
    m, c = kalman.update(mean, cov, MEAS, confidence=np.float32(1.0))
    np.testing.assert_allclose(np.asarray(m)[:4], MEAS, rtol=0, atol=1e-4)
    # posterior measurement-space covariance collapses accordingly
    pm, s = kalman.project(m, c)
    assert float(np.asarray(s)[0, 0]) < float(np.asarray(cov)[0, 0])


def test_batched_update_matches_per_track():
    rng = np.random.RandomState(7)
    means, covs, meas, confs = [], [], [], []
    for i in range(5):
        m0, c0 = kalman.initiate(
            np.array([50.0 + 30 * i, 60.0, 0.5, 30.0 + i], np.float32))
        m0, c0 = kalman.predict(m0, c0)
        means.append(m0); covs.append(c0)
        meas.append(np.asarray(m0)[:4] + rng.randn(4).astype(np.float32))
        confs.append(rng.uniform(0.1, 0.99))
    bm, bc = kalman.update(np.stack(means), np.stack(covs),
                           np.stack(meas).astype(np.float32),
                           confidence=np.array(confs, np.float32))
    for i in range(5):
        sm, sc = kalman.update(means[i], covs[i], meas[i],
                               confidence=np.float32(confs[i]))
        np.testing.assert_allclose(np.asarray(bm)[i], np.asarray(sm),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bc)[i], np.asarray(sc),
                                   rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# tracker-core level
# ---------------------------------------------------------------------------

PARAMS_OFF = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                           feature_dim=16, n_init=2, max_age=5)
PARAMS_NSA = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                           feature_dim=16, n_init=2, max_age=5, nsa=True)


def _unit_feature(seed, dim=16):
    rng = np.random.RandomState(seed)
    f = rng.rand(dim).astype(np.float32)
    return f / np.linalg.norm(f)


def _run(params, confs_by_frame):
    """Track one object with noisy boxes; return per-frame output tlbr."""
    rng = np.random.RandomState(0)
    s = init_state(params)
    feat = _unit_feature(1)
    outs = []
    true = np.array([50.0, 50.0, 30.0, 60.0], np.float32)
    for conf in confs_by_frame:
        true = true + np.array([4.0, 0.0, 0.0, 0.0], np.float32)
        noisy = true + np.concatenate(
            [rng.randn(2).astype(np.float32) * 6.0, np.zeros(2, np.float32)])
        s = predict(s, params)
        d = make_detections(noisy[None], np.array([conf], np.float32),
                            np.zeros(1, np.int32), feat[None], params=params)
        s = update(s, d, params)
        tlbr, ids, cls, cf, mask = get_outputs(s)
        outs.append((np.asarray(tlbr), np.asarray(mask)))
    return outs


def test_tracker_core_nsa_flag_changes_updates():
    off = _run(PARAMS_OFF, [0.95] * 6)
    on = _run(PARAMS_NSA, [0.95] * 6)
    # same lifecycle (same frames confirmed)...
    for (t0, m0), (t1, m1) in zip(off, on):
        np.testing.assert_array_equal(m0, m1)
    # ...but different corrected positions once confirmed
    assert any(
        m0.any() and not np.array_equal(t0, t1)
        for (t0, m0), (t1, m1) in zip(off, on))


def test_tracker_core_default_is_reference_parity():
    assert TrackerParams().nsa is False
    # nsa=False params produce bitwise-identical state to pre-NSA code path
    off = _run(PARAMS_OFF, [0.5, 0.9, 0.2, 0.7])
    again = _run(TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                               feature_dim=16, n_init=2, max_age=5,
                               nsa=False), [0.5, 0.9, 0.2, 0.7])
    for (t0, m0), (t1, m1) in zip(off, again):
        np.testing.assert_array_equal(t0, t1)
        np.testing.assert_array_equal(m0, m1)


def test_nsa_tracks_follow_confident_detections_harder():
    """With high-confidence detections, the NSA track snaps to the
    measured position faster after an abrupt velocity change."""
    params_off, params_nsa = PARAMS_OFF, PARAMS_NSA

    def last_center(params):
        s = init_state(params)
        feat = _unit_feature(1)
        x = 50.0
        for i in range(8):
            x += 3.0
            s = predict(s, params)
            d = make_detections(
                np.array([[x, 50.0, 30.0, 60.0]], np.float32),
                np.array([0.99], np.float32), np.zeros(1, np.int32),
                feat[None], params=params)
            s = update(s, d, params)
        # abrupt jump — a confident detection off the prediction but still
        # matchable (12 px keeps IoU overlap for the stage-2 match;
        # bigger jumps break association for BOTH variants)
        x += 12.0
        s = predict(s, params)
        d = make_detections(
            np.array([[x, 50.0, 30.0, 60.0]], np.float32),
            np.array([0.99], np.float32), np.zeros(1, np.int32),
            feat[None], params=params)
        s = update(s, d, params)
        tlbr, _, _, _, mask = get_outputs(s)
        t = np.asarray(tlbr)[np.asarray(mask)][0]
        return (t[0] + t[2]) / 2.0, x + 15.0  # center_x, measured center_x

    off_cx, target = last_center(params_off)
    nsa_cx, _ = last_center(params_nsa)
    assert abs(nsa_cx - target) < abs(off_cx - target)


# ---------------------------------------------------------------------------
# facade / pipeline surfaces
# ---------------------------------------------------------------------------

def test_facade_accepts_nsa():
    from aicamera_tpu.tracker_api import DeepSORT
    t = DeepSORT(nsa=True, max_tracks=16, max_detections=8, nn_budget=4)
    assert t.params.nsa is True
    boxes = np.array([[10.0, 10.0, 60.0, 90.0]], np.float32)
    frame = np.random.RandomState(0).randint(
        0, 255, (120, 160, 3), np.uint8)
    for _ in range(3):
        t.update(boxes, np.array([0.9], np.float32),
                 np.zeros(1, np.int32), frame)


def test_pipeline_gates_nsa():
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    with pytest.raises(ValueError, match="nsa"):
        TrackingPipeline(tracker="bytetrack", nsa=True)
    with pytest.raises(ValueError, match="tracker_params"):
        TrackingPipeline(tracker_params=PARAMS_NSA, nsa=True)


def test_cli_rejects_nsa_for_motion_trackers():
    import subprocess, sys
    r = subprocess.run(
        [sys.executable, "-m", "aicamera_tpu.cli", "--input", "x.mp4",
         "--tracker", "bytetrack", "--nsa"],
        capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode != 0
    assert "nsa" in (r.stderr + r.stdout).lower()
