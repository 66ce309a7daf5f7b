"""GMC estimation + Kalman-bank warp tests (ops/gmc.py).

The reference has no camera-motion handling (static-camera assumption in
src/tracker/ throughout); cv2.warpAffine serves as the geometry oracle
for the estimator, and the warps are checked against their analytic
Jacobians.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aicamera_tpu.ops import gmc


def _textured(h, w, seed=0, blur=5):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    return cv2.GaussianBlur(img, (blur, blur), 0)


def test_spec_shapes():
    spec = gmc.gmc_spec((540, 960))
    assert spec.pool == 2
    assert spec.affine
    assert spec.n_blocks >= 4
    ph, pw = spec.pooled_hw
    assert all(t + spec.block <= ph for t in spec.tops)
    assert all(l + spec.block <= pw for l in spec.lefts)
    # tiny frames still get a (smaller-block) grid
    small = gmc.gmc_spec((96, 128))
    assert small.pool == 1 and small.block <= 32 and small.affine


def test_translation_recovery():
    img = _textured(270, 480)
    spec = gmc.gmc_spec((270, 480))
    for dx, dy in [(6, 0), (0, -8), (11, 7), (-9, 13)]:
        shifted = np.roll(img, shift=(dy, dx), axis=(0, 1))
        a_mat, t = jax.jit(
            lambda a, b: gmc.estimate_pair(
                gmc.gray_pooled(a, spec), gmc.gray_pooled(b, spec), spec)
        )(jnp.asarray(img), jnp.asarray(shifted))
        np.testing.assert_allclose(np.asarray(a_mat), np.eye(2), atol=0.02)
        assert abs(float(t[0]) - dx) < 1.0, (dx, dy, np.asarray(t))
        assert abs(float(t[1]) - dy) < 1.0, (dx, dy, np.asarray(t))


def test_translation_only_method():
    img = _textured(270, 480, seed=3)
    spec = gmc.gmc_spec((270, 480))
    shifted = np.roll(img, shift=(-5, 9), axis=(0, 1))
    a_mat, t = gmc.estimate_pair(
        gmc.gray_pooled(jnp.asarray(img), spec),
        gmc.gray_pooled(jnp.asarray(shifted), spec), spec,
        method="translation")
    np.testing.assert_array_equal(np.asarray(a_mat), np.eye(2))
    assert abs(float(t[0]) - 9) < 1.0 and abs(float(t[1]) + 5) < 1.0


def test_affine_recovery_vs_cv2_oracle():
    """Rotation+zoom+pan applied by cv2.warpAffine; the estimator must
    recover the same matrix (first-order small-motion regime)."""
    img = _textured(360, 640, seed=1, blur=7)
    spec = gmc.gmc_spec((360, 640))
    m = cv2.getRotationMatrix2D((320, 180), 1.2, 1.03)  # deg, scale
    m[:, 2] += (4.0, -3.0)
    warped = cv2.warpAffine(img, m, (640, 360), borderMode=cv2.BORDER_REFLECT)
    a_mat, t = gmc.estimate_pair(
        gmc.gray_pooled(jnp.asarray(img), spec),
        gmc.gray_pooled(jnp.asarray(warped), spec), spec)
    np.testing.assert_allclose(np.asarray(a_mat), m[:, :2], atol=0.015)
    # translation interacts with the linear part over a 640-px frame:
    # compare where it matters — the motion of concrete points
    for p in [(100.0, 90.0), (320.0, 180.0), (560.0, 300.0)]:
        want = m[:, :2] @ p + m[:, 2]
        got = np.asarray(a_mat) @ p + np.asarray(t)
        np.testing.assert_allclose(got, want, atol=3.0)


def test_static_scene_is_identity():
    img = _textured(270, 480, seed=2)
    spec = gmc.gmc_spec((270, 480))
    a_mat, t = gmc.estimate_pair(
        gmc.gray_pooled(jnp.asarray(img), spec),
        gmc.gray_pooled(jnp.asarray(img), spec), spec)
    np.testing.assert_allclose(np.asarray(a_mat), np.eye(2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=0.05)


def test_flat_scene_falls_back_to_identity():
    """Zero-texture frames give zero-confidence blocks: the ridge prior
    must yield the identity, not NaNs."""
    img = np.full((270, 480, 3), 114, np.uint8)
    spec = gmc.gmc_spec((270, 480))
    a_mat, t = gmc.estimate_pair(
        gmc.gray_pooled(jnp.asarray(img), spec),
        gmc.gray_pooled(jnp.asarray(img), spec), spec)
    assert np.isfinite(np.asarray(a_mat)).all()
    np.testing.assert_allclose(np.asarray(a_mat), np.eye(2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-3)


def test_outlier_blocks_rejected():
    """A large foreground object moving against the camera must not drag
    the estimate (the Huber IRLS pass)."""
    img = _textured(270, 480, seed=4)
    shifted = np.roll(img, shift=(0, 10), axis=(0, 1))  # camera: dx=+10
    # paste a big independently-moving object over one corner block
    obj = _textured(120, 120, seed=5)
    shifted[130:250, 10:130] = np.roll(obj, shift=(0, -40), axis=(0, 1))
    spec = gmc.gmc_spec((270, 480))
    a_mat, t = gmc.estimate_pair(
        gmc.gray_pooled(jnp.asarray(img), spec),
        gmc.gray_pooled(jnp.asarray(shifted), spec), spec)
    assert abs(float(t[0]) - 10) < 1.5, np.asarray(t)
    assert abs(float(t[1])) < 1.5, np.asarray(t)


def test_estimate_chunk_progressive_pan():
    """K frames panning by +7 px/frame: every per-frame estimate is the
    same one-frame translation, and the first (vs prev=first) is zero."""
    base = _textured(270, 480, seed=6)
    frames = np.stack([np.roll(base, shift=(0, 7 * i), axis=(0, 1))
                       for i in range(4)])
    spec = gmc.gmc_spec((270, 480))
    a_mat, t = jax.jit(
        lambda p, f: gmc.estimate_chunk(p, f, spec)
    )(jnp.asarray(frames[0]), jnp.asarray(frames))
    t = np.asarray(t)
    np.testing.assert_allclose(np.asarray(a_mat),
                               np.broadcast_to(np.eye(2), (4, 2, 2)),
                               atol=0.02)
    np.testing.assert_allclose(t[0], [0.0, 0.0], atol=0.1)
    for i in range(1, 4):
        np.testing.assert_allclose(t[i], [7.0, 0.0], atol=1.0)


# --- warps ----------------------------------------------------------------------


def _rand_affine():
    th = np.deg2rad(2.0)
    s = 1.04
    a = s * np.array([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]], np.float32)
    return jnp.asarray(a), jnp.asarray([5.0, -3.0], np.float32)


def test_warp_xyah_bank_analytic():
    rng = np.random.RandomState(0)
    mean = rng.uniform(10, 400, (6, 8)).astype(np.float32)
    l = rng.normal(size=(6, 8, 8)).astype(np.float32)
    cov = l @ l.transpose(0, 2, 1) + 0.1 * np.eye(8, dtype=np.float32)
    active = np.array([True, True, False, True, False, True])
    a_mat, t = _rand_affine()
    nm, nc = gmc.warp_xyah_bank(jnp.asarray(mean), jnp.asarray(cov),
                                a_mat, t, jnp.asarray(active))
    nm, nc = np.asarray(nm), np.asarray(nc)
    a_np, t_np = np.asarray(a_mat), np.asarray(t)
    s = np.sqrt(abs(np.linalg.det(a_np)))
    for i in range(6):
        if not active[i]:
            np.testing.assert_array_equal(nm[i], mean[i])
            np.testing.assert_array_equal(nc[i], cov[i])
            continue
        np.testing.assert_allclose(nm[i, :2], a_np @ mean[i, :2] + t_np,
                                   rtol=1e-5)
        np.testing.assert_allclose(nm[i, 4:6], a_np @ mean[i, 4:6],
                                   rtol=1e-5)
        assert nm[i, 2] == mean[i, 2]                       # aspect kept
        np.testing.assert_allclose(nm[i, 3], s * mean[i, 3], rtol=1e-5)
        np.testing.assert_allclose(nm[i, 7], s * mean[i, 7], rtol=1e-5)
        j = np.eye(8, dtype=np.float32)
        j[0:2, 0:2] = a_np
        j[4:6, 4:6] = a_np
        j[3, 3] = j[7, 7] = s
        np.testing.assert_allclose(nc[i], j @ cov[i] @ j.T, rtol=1e-4,
                                   atol=1e-4)
        # still a valid covariance
        assert np.linalg.eigvalsh(nc[i]).min() > 0


def test_warp_boxes_xyxy_reorders_corners():
    a_mat = jnp.asarray([[np.cos(0.3), -np.sin(0.3)],
                         [np.sin(0.3), np.cos(0.3)]], jnp.float32)
    t = jnp.zeros((2,), jnp.float32)
    out = np.asarray(gmc.warp_boxes_xyxy(
        jnp.asarray([[10.0, 20.0, 50.0, 80.0]]), a_mat, t))[0]
    assert out[0] < out[2] and out[1] < out[3]


def test_warp_ocsort_state_fields_and_sentinels():
    from aicamera_tpu.core import ocsort as oc
    params = oc.OCSortParams(max_tracks=4, max_detections=4)
    state = oc.init_state(params)
    # one live track with full history; one live without observations yet;
    # slots 2-3 inactive
    x = np.zeros((4, 7), np.float32)
    x[0] = [100, 80, 1200, 0.5, 2, 1, 10]
    x[1] = [50, 40, 400, 1.0, 0, 0, 0]
    last = np.full((4, 5), -1.0, np.float32)
    last[0] = [90, 60, 110, 100, 0.9]
    ring = np.zeros((4, params.delta_t + 1, 4), np.float32)
    ring[0, 1] = [88, 58, 108, 98]
    ring_age = np.full((4, params.delta_t + 1), -1, np.int32)
    ring_age[0, 1] = 5
    vel = np.zeros((4, 2), np.float32)
    vel[0] = [0.6, 0.8]  # (dy, dx) unit
    state = state.replace(
        active=jnp.asarray([True, True, False, False]),
        x=jnp.asarray(x), last_obs=jnp.asarray(last),
        obs_ring=jnp.asarray(ring), obs_age=jnp.asarray(ring_age),
        velocity=jnp.asarray(vel),
        frozen_valid=jnp.asarray([True, False, False, False]),
        frozen_x=jnp.asarray(x))
    a_mat, t = _rand_affine()
    out = gmc.warp_ocsort_state(state, a_mat, t)
    a_np, t_np = np.asarray(a_mat), np.asarray(t)
    det = abs(np.linalg.det(a_np))

    np.testing.assert_allclose(np.asarray(out.x)[0, :2],
                               a_np @ x[0, :2] + t_np, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.x)[0, 2], x[0, 2] * det,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.x)[0, 6], x[0, 6] * det,
                               rtol=1e-5)
    # frozen state warps only where frozen_valid
    np.testing.assert_allclose(np.asarray(out.frozen_x)[0, :2],
                               a_np @ x[0, :2] + t_np, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.frozen_x)[1],
                                  np.asarray(state.frozen_x)[1])
    # observed box warps; -1 sentinel rows untouched
    want = gmc.warp_boxes_xyxy(jnp.asarray(last[0:1, :4]), a_mat, t)
    np.testing.assert_allclose(np.asarray(out.last_obs)[0, :4],
                               np.asarray(want)[0], rtol=1e-5)
    assert float(np.asarray(out.last_obs)[0, 4]) == pytest.approx(0.9)
    np.testing.assert_array_equal(np.asarray(out.last_obs)[1], last[1])
    # written ring slot warps; unwritten slots untouched
    assert not np.array_equal(np.asarray(out.obs_ring)[0, 1], ring[0, 1])
    np.testing.assert_array_equal(np.asarray(out.obs_ring)[0, 0],
                                  ring[0, 0])
    # momentum stays unit and rotates
    v = np.asarray(out.velocity)[0]
    assert np.hypot(v[0], v[1]) == pytest.approx(1.0, abs=1e-5)
    assert not np.allclose(v, vel[0])
    np.testing.assert_array_equal(np.asarray(out.velocity)[1], vel[1])
    # inactive slots bitwise-untouched (canonical-zero invariant)
    for f in ("x", "p", "last_obs", "obs_ring", "velocity"):
        np.testing.assert_array_equal(np.asarray(getattr(out, f))[2:],
                                      np.asarray(getattr(state, f))[2:])
