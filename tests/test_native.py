"""Native C++ host runtime (LAPJV solver + letterbox) vs scipy/cv2 oracles."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import aicamera_tpu.native as native
from aicamera_tpu.ops.preprocess import letterbox_spec

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def test_lapjv_matches_scipy_random():
    rng = np.random.RandomState(0)
    for _ in range(30):
        nr, nc = rng.randint(1, 16), rng.randint(1, 16)
        cost = rng.rand(nr, nc).astype(np.float32)
        col4row = native.lapjv(cost)
        r, c = linear_sum_assignment(cost)
        ours = sum(cost[i, col4row[i]] for i in range(nr) if col4row[i] >= 0)
        assert abs(ours - cost[r, c].sum()) < 1e-5
        assigned = col4row[col4row >= 0]
        assert len(set(assigned.tolist())) == len(assigned)  # distinct cols


def test_lapjv_tall_matrix():
    # nr > nc: only nc rows assigned (scipy semantics via transposition)
    cost = np.array([[1.0, 5.0], [2.0, 0.1], [0.2, 9.0]], np.float32)
    col4row = native.lapjv(cost)
    assert (col4row >= 0).sum() == 2
    r, c = linear_sum_assignment(cost)
    ours = sum(cost[i, col4row[i]] for i in range(3) if col4row[i] >= 0)
    assert abs(ours - cost[r, c].sum()) < 1e-6


def test_native_letterbox_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    frame = rng.randint(0, 256, (108, 192, 3), np.uint8)
    spec = letterbox_spec((108, 192), (128, 128))
    ours = native.letterbox(frame, spec)
    resized = cv2.resize(frame, (spec.unpad_hw[1], spec.unpad_hw[0]),
                         interpolation=cv2.INTER_LINEAR)
    canvas = np.full((128, 128, 3), 114, np.uint8)
    canvas[spec.top:spec.top + spec.unpad_hw[0],
           spec.left:spec.left + spec.unpad_hw[1]] = resized
    ref = canvas[..., ::-1].astype(np.float32) / 255.0
    assert np.abs(ours - ref).max() * 255 <= 1.5
