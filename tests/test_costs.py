"""Cost matrices: IoU, cosine distance, gallery appearance cost."""

import numpy as np
import jax.numpy as jnp

from aicamera_tpu.core.costs import (INFTY_COST, appearance_cost_matrix,
                                     cosine_distance_matrix, iou_cost_matrix,
                                     iou_matrix, mean_to_tlwh, tlwh_to_tlbr,
                                     tlwh_to_xyah)


def test_iou_hand_computed():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([
        [0, 0, 10, 10],    # identical -> 1.0
        [5, 5, 10, 10],    # quarter overlap -> 25/175
        [20, 20, 10, 10],  # disjoint -> 0
    ], np.float32)
    iou = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))[0]
    np.testing.assert_allclose(iou, [1.0, 25/175, 0.0], atol=1e-6)


def test_iou_cost_is_one_minus_iou():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10]], np.float32)
    cost = np.asarray(iou_cost_matrix(jnp.asarray(a), jnp.asarray(b)))
    assert cost[0, 0] == 0.0


def test_iou_zero_area_boxes():
    a = np.array([[0, 0, 0, 0]], np.float32)
    b = np.array([[0, 0, 10, 10]], np.float32)
    iou = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    assert np.isfinite(iou).all() and iou[0, 0] == 0.0


def test_cosine_distance():
    a = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    b = np.array([[1.0, 0.0], [1.0, 1.0]], np.float32)
    d = np.asarray(cosine_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(
        d, [[0.0, 1 - 1/np.sqrt(2)], [1.0, 1 - 1/np.sqrt(2)]], atol=1e-6)
    assert (d >= 0).all()


def test_cosine_distance_unnormalized_inputs():
    a = np.array([[10.0, 0.0]], np.float32)
    b = np.array([[3.0, 0.0]], np.float32)
    d = np.asarray(cosine_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    assert d[0, 0] < 1e-6


def test_appearance_cost_min_over_gallery():
    g, d_dim = 3, 4
    gallery = np.zeros((2, g, d_dim), np.float32)
    gallery[0, 0] = [1, 0, 0, 0]
    gallery[0, 1] = [0, 1, 0, 0]
    gallery_valid = np.array([[True, True, False],
                              [False, False, False]])
    det = np.array([[0, 1, 0, 0], [0, 0, 1, 0]], np.float32)
    has_feat = np.array([True, False])
    cost = np.asarray(appearance_cost_matrix(
        jnp.asarray(gallery), jnp.asarray(gallery_valid),
        jnp.asarray(det), jnp.asarray(has_feat)))
    # track 0 vs det 0: min(1-0, 1-1) = 0 (second gallery entry matches)
    assert cost[0, 0] < 1e-6
    # det without feature -> INFTY
    assert cost[0, 1] == INFTY_COST
    # track with empty gallery -> INFTY
    assert cost[1, 0] == INFTY_COST


def test_tlwh_xyah_roundtrip():
    tlwh = np.array([[50, 50, 20, 40]], np.float32)
    xyah = np.asarray(tlwh_to_xyah(jnp.asarray(tlwh)))[0]
    np.testing.assert_allclose(xyah, [60, 70, 0.5, 40])
    # zero height -> aspect 0 (reference detection.py:36-47)
    xyah0 = np.asarray(tlwh_to_xyah(jnp.asarray(
        np.array([[5, 5, 10, 0]], np.float32))))[0]
    assert xyah0[2] == 0.0


def test_mean_to_tlwh_and_tlbr():
    mean = np.zeros((1, 8), np.float32)
    mean[0, :4] = [60, 70, 0.5, 40]
    tlwh = np.asarray(mean_to_tlwh(jnp.asarray(mean)))[0]
    np.testing.assert_allclose(tlwh, [50, 50, 20, 40], atol=1e-4)
    tlbr = np.asarray(tlwh_to_tlbr(jnp.asarray(tlwh[None])))[0]
    np.testing.assert_allclose(tlbr, [50, 50, 70, 90], atol=1e-4)
    # negative height clamps (track.py:141-151)
    mean[0, :4] = [60, 70, 0.5, -5]
    tlwh = np.asarray(mean_to_tlwh(jnp.asarray(mean)))[0]
    assert tlwh[2] == 0.0 and tlwh[3] == 0.0
