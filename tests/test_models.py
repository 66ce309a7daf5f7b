"""Model architecture checks: parameter budgets and DFL decode math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicamera_tpu.models import ReIDNet, YOLOv8
from aicamera_tpu.models.yolov8 import REG_MAX, decode_predictions
from aicamera_tpu.runtime.params import template_params


def n_params(model, hw=(64, 64)):
    # shapes only — materializing template_params runs one tiny compiled
    # program per leaf (~29 s for the 'm' variant on this single core)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, *hw, 3), jnp.float32))
    return sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))


@pytest.mark.parametrize("variant,published_m", [
    ("n", 3.2), ("s", 11.2), ("m", 25.9), ("l", 43.7), ("x", 68.2),
])
def test_yolov8_param_budget_matches_published(variant, published_m):
    """The depth/width/max-channel scaling must land within 2% of the
    published YOLOv8 parameter counts (BN folded, hence slightly less)."""
    total = n_params(YOLOv8(variant=variant)) / 1e6
    assert abs(total - published_m) / published_m < 0.02, \
        f"yolov8{variant}: {total:.2f}M vs published {published_m}M"


def test_reid_feature_dim_and_param_scale():
    model = ReIDNet()
    tpl = template_params(model, jnp.zeros((1, 128, 64, 3), jnp.float32))
    total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tpl))
    assert 5e6 < total < 15e6  # compact residual embedder
    out = jax.eval_shape(model.apply, tpl,
                         jnp.zeros((4, 128, 64, 3), jnp.float32))
    assert out.shape == (4, 512)


def test_dfl_decode_analytic():
    """Feed hand-built head outputs and check the decoded boxes exactly.

    One level at stride 8 on a 2x2 grid. Box bins are one-hot logits
    peaking at bin b => expected distance b; anchors at cell centers.
    """
    h = w = 2
    stride = 8
    nc = 3
    # distance 2 cells on every side for every anchor
    bins = np.full((1, h, w, 4, REG_MAX), -20.0, np.float32)
    bins[..., 2] = 20.0  # one-hot at bin index 2
    cls = np.full((1, h, w, nc), -20.0, np.float32)
    cls[0, 0, 0, 1] = 20.0  # anchor (0,0) confidently class 1

    boxes, scores = decode_predictions(
        [(jnp.asarray(bins.reshape(1, h, w, 4 * REG_MAX)),
          jnp.asarray(cls))],
        input_hw=(16, 16), strides=(stride,))
    boxes = np.asarray(boxes)[0]
    scores = np.asarray(scores)[0]
    assert boxes.shape == (4, 4) and scores.shape == (4, nc)

    # anchor (0,0): center (0.5, 0.5) cells; ltrb distance 2 cells
    np.testing.assert_allclose(
        boxes[0], [(0.5 - 2) * 8, (0.5 - 2) * 8, (0.5 + 2) * 8, (0.5 + 2) * 8],
        atol=1e-3)
    # anchor (1,1) of the row-major grid: center (1.5, 1.5)
    np.testing.assert_allclose(
        boxes[3], [(1.5 - 2) * 8, (1.5 - 2) * 8, (1.5 + 2) * 8, (1.5 + 2) * 8],
        atol=1e-3)
    assert scores[0, 1] > 0.999
    assert scores[1].max() < 1e-6


def test_backbone_feature_pyramid_shapes():
    model = YOLOv8(variant="n")
    tpl = template_params(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    outs = jax.eval_shape(model.apply, tpl,
                          jnp.zeros((2, 128, 160, 3), jnp.float32))
    # strides 8/16/32; box bins 64 channels, cls 80
    assert [tuple(r.shape) for r, _ in outs] == [
        (2, 16, 20, 64), (2, 8, 10, 64), (2, 4, 5, 64)]
    assert [tuple(c.shape) for _, c in outs] == [
        (2, 16, 20, 80), (2, 8, 10, 80), (2, 4, 5, 80)]


def test_c2f_concat_impls_are_checkpoint_compatible_and_equal():
    """The three C2f cv2-input formations (layers.C2f concat_impl) share
    one param tree (checkpoints swap freely) and agree numerically:
    "dus" bitwise with "concat", "sum" within bf16 reduction-order
    noise."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    models = {i: YOLOv8(variant="n", concat_impl=i)
              for i in ("concat", "dus", "sum")}
    tpl = template_params(models["concat"],
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
    ref_structure = jax.tree_util.tree_structure(tpl)
    outs = {}
    for impl, m in models.items():
        assert jax.tree_util.tree_structure(
            template_params(m, jnp.zeros((1, 64, 64, 3), jnp.float32))
        ) == ref_structure, impl
        outs[impl] = m.apply(tpl, x)
    for (rb, rc), (ob, oc) in zip(outs["concat"], outs["dus"]):
        np.testing.assert_array_equal(np.asarray(rb), np.asarray(ob))
        np.testing.assert_array_equal(np.asarray(rc), np.asarray(oc))
    for (rb, rc), (ob, oc) in zip(outs["concat"], outs["sum"]):
        np.testing.assert_allclose(np.asarray(rb, np.float32),
                                   np.asarray(ob, np.float32), atol=1e-4)
        np.testing.assert_allclose(np.asarray(rc, np.float32),
                                   np.asarray(oc, np.float32), atol=1e-4)
