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
