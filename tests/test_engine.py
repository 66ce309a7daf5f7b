"""XLAEngine runtime: AOT compile, warm-up, I/O introspection."""

import jax
import jax.numpy as jnp
import numpy as np

from aicamera_tpu.runtime.engine import TensorInfo, XLAEngine


def _toy(a, b):
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST), jnp.sum(a)


def test_engine_compiles_and_runs():
    eng = XLAEngine(
        _toy,
        example_inputs=[jax.ShapeDtypeStruct((8, 16), jnp.float32),
                        jax.ShapeDtypeStruct((16, 4), jnp.float32)],
        name="toy", warmup_iters=3)
    assert eng.warmup_seconds > 0.0
    a = np.ones((8, 16), np.float32)
    b = np.ones((16, 4), np.float32)
    out, s = eng(a, b)
    np.testing.assert_allclose(np.asarray(out), np.full((8, 4), 16.0))
    assert float(s) == 8 * 16


def test_engine_introspection():
    eng = XLAEngine(
        _toy,
        example_inputs=[jax.ShapeDtypeStruct((8, 16), jnp.float32),
                        jax.ShapeDtypeStruct((16, 4), jnp.float32)],
        name="toy2", warmup_iters=0)
    ins = eng.get_input_details()
    outs = eng.get_output_details()
    assert all(isinstance(t, TensorInfo) for t in ins + outs)
    assert ins[0].shape == (8, 16)
    assert outs[0].shape == (8, 4)
    assert outs[1].shape == ()


def test_engine_accepts_concrete_example_inputs():
    eng = XLAEngine(
        _toy,
        example_inputs=[np.zeros((2, 3), np.float32),
                        np.zeros((3, 2), np.float32)],
        name="toy3", warmup_iters=1)
    out, _ = eng(np.eye(2, 3, dtype=np.float32),
                 np.ones((3, 2), np.float32))
    assert np.asarray(out).shape == (2, 2)
