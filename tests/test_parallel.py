"""Sharding: tensor-parallel detector params over a 'model' mesh axis.

Runs on the 8 virtual CPU devices from conftest. Verifies that GSPMD
channel-sharded inference produces the same results as replicated
inference (the partitioner only changes data placement, not math).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aicamera_tpu.models import YOLOv8
from aicamera_tpu.parallel.tensor_parallel import (replicate_params,
                                                   shard_detector_params)
from aicamera_tpu.runtime.params import template_params


@pytest.fixture(scope="module")
def setup():
    model = YOLOv8(variant="n")
    params = template_params(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    return model, params, x


def test_sharded_params_placement(setup):
    model, params, x = setup
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]), ("model",))
    sharded = shard_detector_params(params, mesh)
    kernels = [p for p in jax.tree.leaves(sharded) if p.ndim == 4]
    # at least the divisible conv kernels actually shard the O dim
    assert any(
        k.sharding.spec == P(None, None, None, "model") for k in kernels)


def test_tp_forward_matches_replicated(setup):
    model, params, x = setup
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]), ("model",))
    fn = jax.jit(model.apply)

    ref = fn(replicate_params(params, mesh), jnp.asarray(x))
    out = fn(shard_detector_params(params, mesh), jnp.asarray(x))
    for (r_box, r_cls), (o_box, o_cls) in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(o_box, np.float32), np.asarray(r_box, np.float32),
            atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(
            np.asarray(o_cls, np.float32), np.asarray(r_cls, np.float32),
            atol=2e-2, rtol=2e-2)


def test_2d_mesh_stream_by_model(setup):
    model, params, x = setup
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("stream", "model"))
    sharded = shard_detector_params(params, mesh)
    xs = jnp.asarray(np.tile(x, (2, 1, 1, 1)))  # batch 4
    xs = jax.device_put(xs, NamedSharding(mesh, P("stream")))
    out = jax.jit(model.apply)(sharded, xs)
    jax.block_until_ready(out)
    assert out[0][0].shape[0] == 4


def test_full_pipeline_step_on_2d_mesh_matches_single_device():
    """VERDICT r1 #6: the FULL multi-stream tracking step (preprocess ->
    detect -> NMS -> crops -> ReID -> vmapped tracker core) over a
    ('stream','model') 2-D mesh with channel-sharded detector params must
    run and match the unsharded single-device pipeline bitwise (output-
    channel sharding does not change any reduction order)."""
    from aicamera_tpu.core.state import TrackerParams
    from aicamera_tpu.parallel import MultiStreamPipeline, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tp = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                       max_age=10, feature_dim=512)
    kw = dict(n_streams=4, frame_hw=(96, 128), input_shape=(128, 128),
              tracker_params=tp, max_reid_crops=4)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (4, 2, 96, 128, 3), np.uint8)  # (S,K,...)

    sharded = MultiStreamPipeline(mesh=make_mesh(4, 2), **kw)
    outs = sharded.step_chunk(frames)
    jax.block_until_ready(outs)

    single = MultiStreamPipeline(**kw)
    outs1 = single.step_chunk(frames)
    jax.block_until_ready(outs1)

    for a, b in zip(jax.device_get(outs), jax.device_get(outs1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # tracker states advanced identically too
    for a, b in zip(jax.tree.leaves(jax.device_get(sharded.states)),
                    jax.tree.leaves(jax.device_get(single.states))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("kind", ["bytetrack", "ocsort"])
def test_multistream_motion_trackers_sharded_matches_single(kind):
    """The motion-only cores (ByteTrack / OC-SORT) as vmapped multi-stream
    tracker steps: the stream-sharded run must match the unsharded
    single-device run bitwise, identical frames on two streams must yield
    identical per-stream outputs, and the device program has no ReID
    stage (the cores carry no appearance model)."""
    from aicamera_tpu.parallel import MultiStreamPipeline, make_stream_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ virtual devices")
    if kind == "bytetrack":
        from aicamera_tpu.core.bytetrack import ByteTrackParams
        kw = dict(tracker="bytetrack",
                  bytetrack_params=ByteTrackParams(max_tracks=16,
                                                   max_detections=8))
    else:
        from aicamera_tpu.core.ocsort import OCSortParams
        kw = dict(tracker="ocsort",
                  ocsort_params=OCSortParams(det_thresh=0.25, max_tracks=16,
                                             max_detections=8))
    base = dict(n_streams=2, frame_hw=(96, 128), input_shape=(128, 128),
                **kw)
    rng = np.random.RandomState(1)
    one = rng.randint(0, 256, (2, 96, 128, 3), np.uint8)  # (K, H, W, 3)
    frames = np.stack([one, one])                         # both streams equal

    sharded = MultiStreamPipeline(mesh=make_stream_mesh(2), **base)
    outs = sharded.step_chunk(frames)
    jax.block_until_ready(outs)
    outs = jax.device_get(outs)

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


def test_multistream_motion_trackers_param_validation():
    from aicamera_tpu.core.bytetrack import ByteTrackParams
    from aicamera_tpu.parallel import MultiStreamPipeline

    with pytest.raises(ValueError):
        MultiStreamPipeline(n_streams=2, frame_hw=(96, 128),
                            tracker="nope")
    with pytest.raises(ValueError):
        MultiStreamPipeline(
            n_streams=2, frame_hw=(96, 128),
            bytetrack_params=ByteTrackParams())  # requires tracker=
