"""Int8 (W8A8) ReID quantization: weight round-trip, int8-vs-f32 embedding
agreement on the trained checkpoint, cosine-distance preservation (the
only quantity the tracker consumes), and the integration surface."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicamera_tpu import config
from aicamera_tpu.models.quant import (QuantReIDNet, quantize_conv,
                                       quantize_reid_params)
from aicamera_tpu.runtime.params import resolve_reid_params

REID_WEIGHTS = Path(__file__).resolve().parent.parent / \
    "models" / "reid" / "deepsort_reid_synthetic.msgpack"


def _norm_crops(n, seed=0):
    """ImageNet-normalized random crops, the embed stage's input domain."""
    rng = np.random.RandomState(seed)
    u8 = rng.randint(0, 256, (n, *config.REID_INPUT_SHAPE, 3), np.uint8)
    x = u8.astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std


def test_quantize_conv_roundtrip_error_bound():
    """Per-channel symmetric int8: |w - dequant(q)| <= scale/2 per
    output channel (round-to-nearest), scale = channel max-abs / 127."""
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 16, 32).astype(np.float32) * \
        rng.rand(32).astype(np.float32)  # varied per-channel ranges
    b = rng.randn(32).astype(np.float32)
    q = quantize_conv(w, b)
    assert q["w"].dtype == jnp.int8 and q["w"].shape == w.shape
    deq = np.asarray(q["w"], np.float32) * np.asarray(q["scale"])
    err = np.abs(deq - w)
    assert np.all(err <= np.asarray(q["scale"]) / 2 + 1e-9)
    assert np.max(np.abs(np.asarray(q["w"]))) <= 127
    np.testing.assert_array_equal(np.asarray(q["bias"]), b)


def test_quantized_tree_mirrors_reid_net():
    model, params = resolve_reid_params()  # seeded-random weights are fine
    qp = quantize_reid_params(params)
    assert set(qp) >= {"stem"} | {f"block{i}" for i in range(8)}
    # projection shortcuts exactly where the channel count changes
    for i in (2, 4, 6):
        assert "proj" in qp[f"block{i}"], i
    for i in (0, 1, 3, 5, 7):
        assert "proj" not in qp[f"block{i}"], i
    for leaf in jax.tree.leaves(qp):
        assert leaf.dtype in (jnp.int8, jnp.float32)


@pytest.mark.skipif(not REID_WEIGHTS.exists(),
                    reason="trained ReID checkpoint not present")
@pytest.mark.slow
def test_int8_embeddings_agree_with_f32_on_trained_weights():
    """The int8 net's embeddings must be near-duplicates of the f32
    net's: per-crop cosine similarity >= 0.99 (i.e. cosine distance
    displacement well under the 0.2 appearance gate)."""
    model, params = resolve_reid_params(str(REID_WEIGHTS))
    qnet = QuantReIDNet(feature_dim=config.REID_FEATURE_DIM)
    qp = quantize_reid_params(params)
    x = jnp.asarray(_norm_crops(16))
    f = np.asarray(jax.jit(model.apply)(params, x), np.float32)
    g = np.asarray(jax.jit(qnet.apply)(qp, x), np.float32)
    # both L2-normalized
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-5)
    cos = np.sum(f * g, axis=-1)
    assert np.min(cos) >= 0.99, f"min cosine {np.min(cos):.4f}"


@pytest.mark.skipif(not REID_WEIGHTS.exists(),
                    reason="trained ReID checkpoint not present")
@pytest.mark.slow
def test_int8_preserves_pairwise_cosine_distances():
    """What the tracker actually consumes is pairwise cosine distance
    (core/costs.py): int8 must not move any pair across the gate by
    more than a small epsilon."""
    model, params = resolve_reid_params(str(REID_WEIGHTS))
    qnet = QuantReIDNet(feature_dim=config.REID_FEATURE_DIM)
    qp = quantize_reid_params(params)
    x = jnp.asarray(_norm_crops(12, seed=3))
    f = np.asarray(jax.jit(model.apply)(params, x), np.float32)
    g = np.asarray(jax.jit(qnet.apply)(qp, x), np.float32)
    d_f = 1.0 - f @ f.T
    d_g = 1.0 - g @ g.T
    assert np.max(np.abs(d_f - d_g)) < 0.02


def test_reid_model_facade_int8():
    from aicamera_tpu.tracker_api import ReIDModel
    m = ReIDModel(quant="int8")
    crops = [np.random.RandomState(1).randint(
        0, 256, (60, 30, 3), np.uint8) for _ in range(3)]
    feats = m.extract_features_batched(crops)
    assert feats.shape == (3, config.REID_FEATURE_DIM)
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=-1), 1.0, atol=1e-4)
    with pytest.raises(ValueError, match="quant"):
        ReIDModel(quant="fp4")


@pytest.mark.slow
def test_pipeline_reid_quant_surface():
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    with pytest.raises(ValueError, match="reid_quant"):
        TrackingPipeline(reid_quant="fp4")
    pipe = TrackingPipeline(reid_quant="int8", chunk_size=2,
                            input_shape=(128, 128))
    assert pipe.reid_quant == "int8"
    assert isinstance(pipe.reid, QuantReIDNet)
    # one tiny chunk end to end through the fused step
    frames = np.random.RandomState(0).randint(
        0, 256, (2, 96, 128, 3), np.uint8)
    results = list(pipe.process_frames(iter(frames)))
    assert len(results) == 2


@pytest.mark.slow
def test_multistream_reid_quant_surface():
    """MultiStreamPipeline(reid_quant='int8'): the quantized embed stage
    runs under vmap across streams; identical frames on both streams
    produce identical outputs."""
    from aicamera_tpu.parallel import MultiStreamPipeline
    with pytest.raises(ValueError, match="reid_quant"):
        MultiStreamPipeline(n_streams=2, frame_hw=(96, 128),
                            reid_quant="fp4")
    pipe = MultiStreamPipeline(n_streams=2, frame_hw=(96, 128),
                               input_shape=(128, 128),
                               reid_quant="int8", max_reid_crops=4)
    assert pipe.reid_quant == "int8"
    one = np.random.RandomState(3).randint(0, 256, (2, 96, 128, 3),
                                           np.uint8)
    outs = pipe.step_chunk(np.stack([one, one]))
    for o in outs:
        a = np.asarray(o)
        np.testing.assert_array_equal(a[0], a[1])
