"""Pipeline parallelism: stage-split detector over multiple devices.

Runs on the 8 virtual CPU devices from conftest. The stage split must
reproduce the full fused forward (same math, different placement), the
multi-device placement must be bitwise-identical to the same split on one
device (device_put moves data, never changes it), and the outputs must
feed the fixed-shape decode+NMS unchanged.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicamera_tpu.models import YOLOv8
from aicamera_tpu.parallel import PipelineParallelDetector, split_stage_params
from aicamera_tpu.runtime.params import template_params


@pytest.fixture(scope="module")
def setup():
    model = YOLOv8(variant="n")
    params = template_params(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    x = np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32)
    return model, params, x


def test_stage_split_covers_full_param_tree(setup):
    model, params, x = setup
    bp, np_, hp = split_stage_params(params)
    n_leaves = sum(len(jax.tree.leaves(t)) for t in (bp, np_, hp))
    assert n_leaves == len(jax.tree.leaves(params))


def test_matches_full_fused_forward(setup):
    model, params, x = setup
    pp = PipelineParallelDetector("n", devices=jax.devices()[:3])
    pp.place_params(params)
    out = pp.forward(jnp.asarray(x), microbatch=4)
    ref = jax.jit(model.apply)(params, jnp.asarray(x))
    for (r_box, r_cls), (o_box, o_cls) in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(o_box, np.float32), np.asarray(r_box, np.float32),
            atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(
            np.asarray(o_cls, np.float32), np.asarray(r_cls, np.float32),
            atol=2e-2, rtol=2e-2)


def test_multi_device_bitwise_matches_single_device(setup):
    """Same stage programs, different placement: crossing devices must not
    change a single bit."""
    model, params, x = setup
    multi = PipelineParallelDetector("n", devices=jax.devices()[:3])
    multi.place_params(params)
    single = PipelineParallelDetector("n", devices=jax.devices()[:1])
    single.place_params(params)
    a = multi.forward(jnp.asarray(x), microbatch=2)
    b = single.forward(jnp.asarray(x), microbatch=2)
    for (a_box, a_cls), (b_box, b_cls) in zip(a, b):
        np.testing.assert_array_equal(np.asarray(a_box), np.asarray(b_box))
        np.testing.assert_array_equal(np.asarray(a_cls), np.asarray(b_cls))


def test_microbatching_concatenates_in_order(setup):
    """mb=2 over b=4 equals running each half through the same stage
    programs by hand (identical shapes -> identical executables)."""
    model, params, x = setup
    pp = PipelineParallelDetector("n", devices=jax.devices()[:3])
    pp.place_params(params)
    out = pp.forward(jnp.asarray(x), microbatch=2)
    h1 = pp.forward(jnp.asarray(x[:2]), microbatch=2)
    h2 = pp.forward(jnp.asarray(x[2:]), microbatch=2)
    want = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), h1, h2)
    for (w_box, w_cls), (o_box, o_cls) in zip(want, out):
        np.testing.assert_array_equal(np.asarray(o_box), np.asarray(w_box))
        np.testing.assert_array_equal(np.asarray(o_cls), np.asarray(w_cls))


def test_stage_placement(setup):
    model, params, x = setup
    devs = jax.devices()[:3]
    pp = PipelineParallelDetector("n", devices=devs)
    pp.place_params(params)
    for tree, dev in zip(pp._stage_params, devs):
        for leaf in jax.tree.leaves(tree):
            assert leaf.devices() == {dev}


def test_outputs_feed_decode_nms(setup):
    from aicamera_tpu.ops.nms import fused_decode_nms
    model, params, x = setup
    pp = PipelineParallelDetector("n", devices=jax.devices()[:3])
    pp.place_params(params)
    out = pp.forward(jnp.asarray(x), microbatch=2)
    num, boxes, scores, labels = fused_decode_nms(
        out, score_threshold=0.25, iou_threshold=0.45, top_k=64, max_det=16)
    assert boxes.shape == (4, 16, 4)
    assert num.shape == (4,)


def test_validation_errors(setup):
    model, params, x = setup
    pp = PipelineParallelDetector("n", devices=jax.devices()[:3])
    with pytest.raises(RuntimeError, match="place_params"):
        pp.forward(jnp.asarray(x), microbatch=2)
    pp.place_params(params)
    with pytest.raises(ValueError, match="not divisible"):
        pp.forward(jnp.asarray(x), microbatch=3)
    with pytest.raises(ValueError, match="at least one device"):
        PipelineParallelDetector("n", devices=[])


@pytest.mark.slow
def test_composed_stage_meshes_match_single_device(setup):
    # slow tier (27 s measured): the 12-device composed pp x dp x tp
    # forward — the same class as the 16-device dryrun already deferred
    """All three parallelism axes in one forward — stage (pipeline) x
    stream (dp) x model (tp): each stage on its own 2-D
    ('stream','model') sub-mesh with channel-sharded params must match
    the degenerate single-device stage split to bf16 tolerance. (Not
    bitwise: when a conv's INPUT activations arrive channel-sharded,
    GSPMD splits the input-channel reduction into per-device partial
    sums + an all-reduce — a different accumulation order. Measured
    max-abs diff ~2e-6 on ~1e-4-scale bf16 outputs.)"""
    from jax.sharding import Mesh

    model, params, x = setup
    devs = np.array(jax.devices())
    if devs.size < 8:
        pytest.skip("needs 8 virtual devices")
    meshes = [Mesh(devs[k * 4:(k + 1) * 4].reshape(2, 2)
                   if k < 2 else devs[:4].reshape(2, 2),
                   ("stream", "model")) for k in range(3)]
    composed = PipelineParallelDetector("n", meshes=meshes)
    composed.place_params(params)
    single = PipelineParallelDetector("n", devices=jax.devices()[:1])
    single.place_params(params)
    a = composed.forward(jnp.asarray(x), microbatch=2)
    b = single.forward(jnp.asarray(x), microbatch=2)
    for (a_box, a_cls), (b_box, b_cls) in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(a_box, np.float32), np.asarray(b_box, np.float32),
            atol=1e-3, rtol=2e-2)
        np.testing.assert_allclose(
            np.asarray(a_cls, np.float32), np.asarray(b_cls, np.float32),
            atol=1e-3, rtol=2e-2)
    # the tp axis is real: conv kernels are sharded over 'model'
    kernels = [p for p in jax.tree.leaves(composed._stage_params[0])
               if p.ndim == 4]
    assert any("model" in str(k.sharding.spec) for k in kernels)


def test_composed_mesh_validation(setup):
    from jax.sharding import Mesh
    model, params, x = setup
    devs = np.array(jax.devices())
    good = Mesh(devs[:4].reshape(2, 2), ("stream", "model"))
    bad = Mesh(devs[:2], ("x",))
    with pytest.raises(ValueError, match="stream"):
        PipelineParallelDetector("n", meshes=[bad])
    with pytest.raises(ValueError, match="not both"):
        PipelineParallelDetector("n", meshes=[good],
                                 devices=jax.devices()[:1])
    with pytest.raises(ValueError, match="at least one mesh"):
        PipelineParallelDetector("n", meshes=[])


def test_composed_microbatch_validation(setup):
    """Explicit microbatch not divisible by the stage meshes' 'stream'
    axis must fail with a clear error; the default rounds itself to a
    valid size (covered by the composed equality test)."""
    from jax.sharding import Mesh
    model, params, x = setup
    devs = np.array(jax.devices())
    if devs.size < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(devs[:4].reshape(2, 2), ("stream", "model"))
    pp = PipelineParallelDetector("n", meshes=[mesh])
    pp.place_params(params)
    with pytest.raises(ValueError, match="stream"):
        pp.forward(jnp.asarray(x[:3]), microbatch=3)
