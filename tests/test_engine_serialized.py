"""Serialized .xlae engine artifacts: export → load → run parity.

The reference deserializes self-contained TRT ``.engine`` files
(trt_engine.py:45-60) built by trtexec (export_trt_engines.sh). Here the
analog is ``jax.export`` StableHLO artifacts with the weights baked in as
constants. These tests prove the full UX: a detector/embedder loaded from
an artifact — with no weight resolution and no model code — reproduces the
source model bitwise, enforces its baked shapes, and the ReID artifact's
symbolic batch axis replays at any concrete batch (TRT dynamic-batch
analog).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicamera_tpu.runtime.engine import (ENGINE_FILE_SUFFIX,
                                         SerializedEngine, export_engine,
                                         is_engine_file, load_engine)

FRAME_HW = (96, 128)
INPUT_HW = (128, 128)


def test_roundtrip_bitwise_and_introspection(tmp_path):
    w = jnp.asarray(np.random.RandomState(0).rand(8, 4).astype(np.float32))

    def fn(x):  # weights closed over -> baked into the artifact
        return jnp.tanh(x @ w), jnp.sum(x, axis=-1)

    x = np.random.RandomState(1).rand(3, 8).astype(np.float32)
    path = tmp_path / f"tiny{ENGINE_FILE_SUFFIX}"
    export_engine(fn, [x], path, name="tiny", metadata={"k": [1, 2]})
    assert is_engine_file(path)

    eng = load_engine(path)
    assert eng.name == "tiny"
    assert eng.metadata == {"k": [1, 2]}
    ins, outs = eng.get_input_details(), eng.get_output_details()
    assert ins[0].shape == (3, 8) and ins[0].dtype == jnp.float32
    assert outs[0].shape == (3, 4) and outs[1].shape == (3,)

    got = eng(x)
    want = fn(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    eng.warm_up([x], iters=2)  # smoke


def test_load_rejects_non_engine_file(tmp_path):
    bad = tmp_path / f"bad{ENGINE_FILE_SUFFIX}"
    bad.write_bytes(b"definitely not an engine")
    with pytest.raises(ValueError, match="bad magic"):
        SerializedEngine.load(bad)


def test_exported_call_composes_inside_jit(tmp_path):
    w = jnp.full((4, 4), 0.5, jnp.float32)

    def fn(x):
        return x @ w

    path = tmp_path / f"compose{ENGINE_FILE_SUFFIX}"
    export_engine(fn, [jax.ShapeDtypeStruct((2, 4), jnp.float32)], path)
    eng = load_engine(path)

    @jax.jit
    def outer(x):
        return eng.exported.call(x) + 1.0

    x = jnp.ones((2, 4), jnp.float32)
    np.testing.assert_allclose(np.asarray(outer(x)),
                               np.asarray(fn(x) + 1.0))


@pytest.fixture(scope="module")
def detector():
    from aicamera_tpu.detector import YOLODetector
    return YOLODetector(input_shape=INPUT_HW)


def test_detector_engine_roundtrip_bitwise(tmp_path, detector):
    from aicamera_tpu.detector import YOLODetector

    path = tmp_path / f"yolo{ENGINE_FILE_SUFFIX}"
    detector.export_engine(FRAME_HW, path)

    det2 = YOLODetector(engine_path=str(path))
    assert det2.input_shape == INPUT_HW  # baked metadata wins
    assert det2.conf_threshold == detector.conf_threshold

    frame = np.random.RandomState(2).randint(
        0, 256, (*FRAME_HW, 3), np.uint8)
    b1, s1, c1, i1 = detector.detect(frame)
    b2, s2, c2, i2 = det2.detect(frame)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(i1, i2)

    eng = det2.get_engine(FRAME_HW)
    assert eng.get_input_details()[0].shape == (*FRAME_HW, 3)

    # the artifact is fixed-shape, like the reference's TRT engine
    wrong = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="frame shape"):
        det2.detect(wrong)

    # a loaded detector cannot re-export (weights live in the artifact)
    with pytest.raises(ValueError, match="loaded from a serialized"):
        det2.export_engine(FRAME_HW, tmp_path / "again.xlae")


@pytest.fixture(scope="module")
def reid_engine_path(tmp_path_factory):
    from aicamera_tpu.tracker_api import ReIDModel
    path = tmp_path_factory.mktemp("engines") / f"reid{ENGINE_FILE_SUFFIX}"
    ReIDModel().export_engine(path)
    return path


def test_reid_engine_dynamic_batch(reid_engine_path):
    from aicamera_tpu.tracker_api import ReIDModel

    rm = ReIDModel()
    rm2 = ReIDModel(engine_path=str(reid_engine_path))
    assert rm2.feature_dim == rm.feature_dim
    assert rm2.input_shape == rm.input_shape

    rng = np.random.RandomState(3)
    crops = [rng.randint(0, 256, (50, 20, 3), np.uint8) for _ in range(3)]
    crops.insert(1, np.zeros((0, 0, 3), np.uint8))  # invalid crop row
    f1 = rm.extract_features_batched(crops)
    f2 = rm2.extract_features_batched(crops)
    assert f1.shape == f2.shape == (4, rm.feature_dim)
    np.testing.assert_allclose(f1, f2, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(f1[1], np.zeros(rm.feature_dim))

    # symbolic batch axis replays at multiple concrete batch sizes
    eng = rm2._serialized
    for b in (2, 5):
        x = rng.rand(b, *rm.input_shape, 3).astype(np.float32)
        out = np.asarray(eng(x))
        assert out.shape == (b, rm.feature_dim)
        direct = np.asarray(rm._apply(rm.params, jnp.asarray(x)))
        np.testing.assert_allclose(out, direct, rtol=1e-6, atol=1e-6)


def test_deepsort_with_serialized_reid_matches_weights(reid_engine_path):
    from aicamera_tpu.tracker_api import DeepSORT

    def scenario(ds):
        frame = np.zeros((*FRAME_HW, 3), np.uint8)
        frame[20:60, 30:70] = 128
        box = np.array([[30.0, 20.0, 70.0, 60.0]], np.float32)
        outs = []
        for k in range(4):
            outs.append(ds.update(box + 2 * k, np.array([0.9]),
                                  np.array([0]), frame))
        return outs

    kw = dict(n_init=2, max_age=5, max_tracks=16, max_detections=8,
              max_reid_crops=4)
    ref = scenario(DeepSORT(**kw))
    got = scenario(DeepSORT(reid_model_path=str(reid_engine_path), **kw))
    assert got == ref
    assert any(len(o) == 1 for o in ref)  # the scenario actually tracks
