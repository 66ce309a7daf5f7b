"""Static-calibrated int8 YOLOv8 (models/quant_yolo.py): output contract,
agreement with the f32 model, scale folding, and the pipeline surface.

Small input shapes keep the CPU int8 convs fast; the architecture walk
(every conv, every concat/slice/pool) is identical at any size.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicamera_tpu.models import YOLOv8
from aicamera_tpu.models.quant_yolo import QuantYOLOv8
from aicamera_tpu.runtime.params import template_params

WEIGHTS = Path(__file__).resolve().parent.parent / \
    "models" / "detection" / "yolov8n_synthetic.msgpack"


@pytest.fixture(scope="module")
def built():
    model = YOLOv8(variant="n", dtype=jnp.float32)
    params = template_params(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    calib = np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32)
    q = QuantYOLOv8("n")
    scales = q.calibrate(params, calib, batch=2)
    qparams = q.build(params, scales)
    return model, params, q, qparams, scales


def test_apply_matches_f32_contract_and_correlates(built):
    model, params, q, qparams, scales = built
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    out = q.apply(qparams, jnp.asarray(x))
    ref = jax.jit(model.apply)(params, jnp.asarray(x))
    assert len(out) == 3
    for (rq, cq), (rf, cf) in zip(out, ref):
        assert rq.shape == rf.shape and cq.shape == cf.shape
        # int8 twin tracks the f32 model closely even on random weights
        for a, b in ((rq, rf), (cq, cf)):
            corr = np.corrcoef(np.asarray(a, np.float32).ravel(),
                               np.asarray(b, np.float32).ravel())[0, 1]
            assert corr > 0.99, corr


def test_weights_are_int8_and_scales_cover_every_conv(built):
    model, params, q, qparams, scales = built
    assert all(v["w"].dtype == jnp.int8 for v in qparams.values())
    # yolov8n: 57 quantized convs + 6 unquantized head outs = 63 convs
    # (the template's exact conv count, models/onnx_import.py)
    assert len(qparams) == 63
    n_out_convs = sum(1 for k in qparams if k.endswith("_out"))
    assert n_out_convs == 6
    # every quantized conv output has a calibrated scale
    for k in qparams:
        if not k.endswith("_out"):
            assert k in scales and scales[k] > 0


def test_feeds_decode_nms_unchanged(built):
    from aicamera_tpu.ops.nms import fused_decode_nms
    model, params, q, qparams, scales = built
    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    out = q.apply(qparams, jnp.asarray(x))
    num, boxes, scores, labels = fused_decode_nms(
        out, score_threshold=0.25, iou_threshold=0.45, top_k=64, max_det=16)
    assert boxes.shape == (2, 16, 4) and num.shape == (2,)


def test_build_requires_then_binds_scales():
    q = QuantYOLOv8("n")
    with pytest.raises(RuntimeError, match="build"):
        q.apply({}, jnp.zeros((1, 64, 64, 3)))


@pytest.mark.skipif(not WEIGHTS.exists(),
                    reason="synthetic checkpoint not trained")
@pytest.mark.slow
def test_trained_detections_survive_quantization():
    """With the trained checkpoint, the int8 pipeline must detect the
    same synthetic objects as the bf16 one: scoring int8 detections
    against the bf16 detections as ground truth, AP50 stays high."""
    from aicamera_tpu.eval import evaluate_detections
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu.synthetic import WorldSpec, random_scene

    spec = WorldSpec(hw=(136, 240), max_objects=6, presence=1.0)
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    frames = [np.asarray(random_scene(k, spec)[0]) for k in keys]

    outs = {}
    for name, quant in (("bf16", None), ("int8", "int8")):
        pipe = TrackingPipeline(chunk_size=2, yolo_weights=str(WEIGHTS),
                                yolo_quant=quant, input_shape=(256, 256),
                                conf_threshold=0.3)
        outs[name] = [(r.det_boxes, r.det_scores, r.det_labels)
                      for r in pipe.process_frames(iter(frames))]
    gt = [(b, l) for b, s, l in outs["bf16"]]
    ap = evaluate_detections(gt, outs["int8"])
    assert ap.ap50 >= 0.85, ap.ap50
