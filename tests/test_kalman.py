"""Kalman filter numerics vs an independent NumPy oracle.

The oracle below implements the documented DeepSORT constant-velocity KF
equations (std weights 1/20 and 1/160, h-proportional noise) directly with
NumPy — matching the behavioral contract of reference
``src/tracker/core/kalman_filter.py`` without sharing code.
"""

import numpy as np
import pytest

from aicamera_tpu.core import kalman


WP, WV = 1.0 / 20, 1.0 / 160


def np_initiate(m):
    mean = np.concatenate([m, np.zeros(4)])
    h = m[3]
    std = np.array([2*WP*h, 2*WP*h, 1e-2, 2*WP*h,
                    10*WV*h, 10*WV*h, 1e-5, 10*WV*h])
    return mean, np.diag(std ** 2)


def np_predict(mean, cov):
    f = np.eye(8)
    f[np.arange(4), np.arange(4) + 4] = 1.0
    h = mean[3]
    std = np.array([WP*h, WP*h, 1e-2, WP*h, WV*h, WV*h, 1e-5, WV*h])
    return f @ mean, f @ cov @ f.T + np.diag(std ** 2)


def np_project(mean, cov):
    hm = np.eye(4, 8)
    h = mean[3]
    std = np.array([WP*h, WP*h, 1e-1, WP*h])
    return hm @ mean, hm @ cov @ hm.T + np.diag(std ** 2)


def np_update(mean, cov, meas):
    pm, s = np_project(mean, cov)
    gain = np.linalg.solve(s, (cov @ np.eye(4, 8).T).T).T
    new_mean = mean + gain @ (meas - pm)
    new_cov = cov - gain @ s @ gain.T
    return new_mean, new_cov


@pytest.fixture
def measurement():
    return np.array([115.0, 180.0, 0.5, 60.0], dtype=np.float32)


def test_initiate_matches_oracle(measurement):
    mean, cov = kalman.initiate(measurement)
    ref_mean, ref_cov = np_initiate(measurement)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), ref_cov, rtol=1e-5)


def test_initiate_batched(measurement):
    batch = np.stack([measurement, measurement * 2])
    mean, cov = kalman.initiate(batch)
    assert mean.shape == (2, 8)
    assert cov.shape == (2, 8, 8)


def test_predict_matches_oracle(measurement):
    mean, cov = kalman.initiate(measurement)
    pm, pc = kalman.predict(mean, cov)
    ref_m, ref_c = np_predict(*np_initiate(measurement))
    np.testing.assert_allclose(np.asarray(pm), ref_m, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pc), ref_c, rtol=1e-4)
    # uncertainty must not decrease on predict
    assert np.all(np.diag(np.asarray(pc)) >= np.diag(np.asarray(cov)) - 1e-6)


def test_predict_moves_with_velocity(measurement):
    mean, cov = kalman.initiate(measurement)
    mean = np.asarray(mean).copy()
    mean[4] = 3.0  # v_cx
    pm, _ = kalman.predict(mean, cov)
    assert np.asarray(pm)[0] == pytest.approx(118.0)


def test_update_matches_oracle(measurement):
    mean, cov = kalman.initiate(measurement)
    pm, pc = kalman.predict(mean, cov)
    meas2 = np.array([118, 183, 0.51, 62], dtype=np.float32)
    um, uc = kalman.update(pm[None], pc[None], meas2[None])
    ref_m, ref_c = np_update(np.asarray(pm, np.float64),
                             np.asarray(pc, np.float64), meas2)
    np.testing.assert_allclose(np.asarray(um)[0], ref_m, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(uc)[0], ref_c, rtol=1e-3, atol=1e-5)
    # updated mean pulled toward the measurement
    assert abs(np.asarray(um)[0][0] - 118) < abs(np.asarray(pm)[0] - 118)


def test_gating_distance_orders_measurements(measurement):
    mean, cov = kalman.initiate(measurement)
    pm, pc = kalman.predict(mean, cov)
    um, uc = kalman.update(pm, pc, np.array([118, 183, 0.51, 62], np.float32))
    meas = np.array([
        [118, 183, 0.51, 62],   # close
        [10, 10, 0.4, 50],      # far
        [117, 182, 0.50, 61],   # close-ish
    ], dtype=np.float32)
    d = np.asarray(kalman.gating_distance(um[None], uc[None], meas))[0]
    assert d.shape == (3,)
    assert d[0] < d[1] and d[2] < d[1]
    assert d[0] < kalman.CHI2INV95[4]
    dpos = np.asarray(kalman.gating_distance(
        um[None], uc[None], meas, only_position=True))[0]
    assert dpos[0] < dpos[1]


def test_gating_distance_singular_covariance_returns_inf():
    mean = np.zeros((1, 8), np.float32)
    cov = np.zeros((1, 8, 8), np.float32)
    cov[0, 2, 2] = -1.0  # not positive definite even after adding R
    cov[0, 3, 3] = -1.0
    meas = np.array([[0, 0, 1.0, 10.0]], np.float32)
    d = np.asarray(kalman.gating_distance(mean, cov, meas))
    assert np.isinf(d).all()
