"""Data-parallel training step (train.py::make_train_step_dp) on the
8 virtual CPU devices: batch sharded over a mesh axis, params replicated,
gradient all-reduce implied by the batch mean."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from aicamera_tpu.models import YOLOv8
from aicamera_tpu.ops.preprocess import letterbox_spec
from aicamera_tpu.runtime.params import template_params
from aicamera_tpu.synthetic import WorldSpec
from aicamera_tpu.train import (TrainConfig, make_train_step,
                                make_train_step_dp)

INPUT_HW = (64, 64)


WORLD = WorldSpec(hw=(48, 64), max_objects=4, presence=1.0)
CFG = TrainConfig(batch=8, scan=2, lr=1e-3, warmup=1)


@pytest.fixture(scope="module")
def setup():
    model = YOLOv8(variant="n", dtype=jnp.float32)
    params = template_params(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    spec = letterbox_spec(WORLD.hw, INPUT_HW)
    tx = optax.adamw(CFG.lr)
    opt_state = tx.init(params)
    return model, params, spec, tx, opt_state


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("batch",))


def test_dp_step_runs_and_matches_single_device(setup):
    model, params, spec, tx, opt_state = setup
    key = jax.random.PRNGKey(0)

    single = make_train_step(model, WORLD, spec, INPUT_HW, CFG, tx)
    p1, _, losses1, _ = single(params, opt_state, key)

    dp = make_train_step_dp(model, WORLD, spec, INPUT_HW, CFG, tx,
                            _mesh(8))
    p2, _, losses2, _ = dp(params, opt_state, key)

    # identical math modulo the sharded batch-mean reduction order
    np.testing.assert_allclose(np.asarray(losses2), np.asarray(losses1),
                               rtol=1e-4, atol=1e-5)
    l1 = jax.tree.leaves(p1)
    l2 = jax.tree.leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)


def test_dp_loss_decreases(setup):
    model, params, spec, tx, opt_state = setup
    dp = make_train_step_dp(model, WORLD, spec, INPUT_HW, CFG, tx,
                            _mesh(8))
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(6):
        key, sub = jax.random.split(key)
        params, opt_state, losses, _ = dp(params, opt_state, sub)
        if first is None:
            first = float(np.asarray(losses)[0])
    last = float(np.asarray(losses)[-1])
    assert last < first


def test_dp_outputs_replicated(setup):
    model, params, spec, tx, opt_state = setup
    mesh = _mesh(4)
    dp = make_train_step_dp(model, WORLD, spec, INPUT_HW, CFG, tx, mesh)
    p, o, losses, aux = dp(params, opt_state, jax.random.PRNGKey(2))
    leaf = jax.tree.leaves(p)[0]
    assert len(leaf.devices()) == 4  # replicated across the mesh
    assert losses.shape == (CFG.scan,)


def test_dp_batch_divisibility_validated(setup):
    model, params, spec, tx, opt_state = setup
    with pytest.raises(ValueError, match="not divisible"):
        make_train_step_dp(model, WORLD, spec, INPUT_HW,
                           TrainConfig(batch=6), tx, _mesh(4))
