"""On-device image ops: letterbox geometry/parity, NMS semantics, crops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aicamera_tpu.ops.preprocess import (letterbox_spec, preprocess_yolo,
                                         scale_boxes_back)
from aicamera_tpu.ops.nms import batched_nms, fused_decode_nms
from aicamera_tpu.ops.crops import extract_reid_crops


def test_letterbox_spec_960x540_to_640():
    spec = letterbox_spec((540, 960), (640, 640))
    # min-ratio, no scale-up: r = 640/960
    assert spec.ratio == pytest.approx(2 / 3)
    assert spec.unpad_hw == (360, 640)
    assert spec.pad_wh == (0.0, 140.0)
    assert spec.top == 140 and spec.left == 0
    # the +-0.1 rounding trick (image_processing.py:66-67)
    spec2 = letterbox_spec((101, 640), (640, 640))
    assert spec2.unpad_hw[0] == 101  # no scale-up for smaller images
    assert spec2.top == int(round((640 - 101) / 2 - 0.1))


def test_letterbox_no_scaleup():
    spec = letterbox_spec((100, 200), (640, 640))
    assert spec.ratio == 1.0
    assert spec.unpad_hw == (100, 200)


def test_preprocess_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 256, (54, 96, 3), np.uint8)
    spec = letterbox_spec((54, 96), (64, 64))
    ours = np.asarray(jax.jit(
        lambda f: preprocess_yolo(f, spec, jnp.float32))(jnp.asarray(frame)))[0]
    resized = cv2.resize(frame, (spec.unpad_hw[1], spec.unpad_hw[0]),
                         interpolation=cv2.INTER_LINEAR)
    canvas = np.full((64, 64, 3), 114, np.uint8)
    canvas[spec.top:spec.top + spec.unpad_hw[0],
           spec.left:spec.left + spec.unpad_hw[1]] = resized
    ref = canvas[..., ::-1].astype(np.float32) / 255.0
    # cv2 uses fixed-point arithmetic; agree within 1 gray level
    assert np.abs(ours - ref).max() * 255 <= 1.5


def test_pallas_preprocess_bitmatches_xla():
    from aicamera_tpu.ops.pallas_preprocess import preprocess_yolo_pallas
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(1)
    frame = rng.randint(0, 256, (54, 96, 3), np.uint8)
    spec = letterbox_spec((54, 96), (64, 64))
    ref = np.asarray(jax.jit(
        lambda f: preprocess_yolo(f, spec, jnp.float32))(jnp.asarray(frame)))
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            ours = np.asarray(preprocess_yolo_pallas(
                jnp.asarray(frame), spec, jnp.float32))
    else:  # pragma: no cover - real TPU path
        ours = np.asarray(preprocess_yolo_pallas(
            jnp.asarray(frame), spec, jnp.float32))
    # within one uint8 LSB (Mosaic and XLA may schedule the matmuls with
    # different accumulation precision)
    assert np.abs(ours - ref).max() * 255 <= 1.5


def test_pallas_preprocess_pad_tile_skip():
    """Geometry where whole 64-row tiles are pure padding (the kernel's
    skip-matmul fast path): content must match XLA, pad rows must be
    114/255 exactly."""
    from aicamera_tpu.ops.pallas_preprocess import preprocess_yolo_pallas
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(2)
    frame = rng.randint(0, 256, (16, 128, 3), np.uint8)
    spec = letterbox_spec((16, 128), (192, 128))  # content rows 88..103
    ref = np.asarray(jax.jit(
        lambda f: preprocess_yolo(f, spec, jnp.float32))(jnp.asarray(frame)))
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            ours = np.asarray(preprocess_yolo_pallas(
                jnp.asarray(frame), spec, jnp.float32))
    else:  # pragma: no cover - real TPU path
        ours = np.asarray(preprocess_yolo_pallas(
            jnp.asarray(frame), spec, jnp.float32))
    assert np.abs(ours - ref).max() * 255 <= 1.5
    np.testing.assert_allclose(ours[0, :64], 114.0 / 255.0, rtol=1e-6)
    np.testing.assert_allclose(ours[0, 128:], 114.0 / 255.0, rtol=1e-6)


def test_scale_boxes_back_roundtrip():
    spec = letterbox_spec((540, 960), (640, 640))
    # full letterboxed content box maps back to the full frame
    boxes = jnp.asarray([[0.0, 140.0, 640.0, 500.0]])
    back = np.asarray(scale_boxes_back(boxes, spec))[0]
    np.testing.assert_allclose(back, [0, 0, 960, 540], atol=1e-3)
    # clipping to the frame (image_processing.py:178-181)
    boxes = jnp.asarray([[-50.0, 0.0, 10000.0, 10000.0]])
    back = np.asarray(scale_boxes_back(boxes, spec))[0]
    assert back[0] == 0 and back[2] == 960 and back[3] == 540


def np_greedy_nms(boxes, scores, st, it, max_det):
    best = scores.max(1)
    cls = scores.argmax(1)
    order = np.argsort(-best)
    keep = []

    def iou(a, b):
        ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
        ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1])
        return inter / max(ua - inter, 1e-7)

    for i in order:
        if best[i] < st:
            continue
        if any(cls[i] == cls[j] and iou(boxes[i], boxes[j]) > it
               for j in keep):
            continue
        keep.append(i)
        if len(keep) >= max_det:
            break
    return keep


def test_nms_matches_greedy_oracle():
    rng = np.random.RandomState(0)
    a, c = 200, 4
    boxes = rng.rand(a, 4).astype(np.float32) * 200
    boxes[:, 2:] = boxes[:, :2] + rng.rand(a, 2).astype(np.float32) * 80 + 5
    scores = (rng.rand(a, c).astype(np.float32)) ** 2
    num, ob, osc, ocl = batched_nms(
        jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
        score_threshold=0.25, iou_threshold=0.5, top_k=128, max_det=32)
    ref = np_greedy_nms(boxes, scores, 0.25, 0.5, 32)
    assert int(num[0]) == len(ref)
    np.testing.assert_allclose(np.asarray(ob[0][:len(ref)]), boxes[ref],
                               atol=1e-4)
    # scores are descending
    s = np.asarray(osc[0][:len(ref)])
    assert (np.diff(s) <= 1e-6).all()


def test_nms_empty_scene():
    boxes = jnp.zeros((1, 50, 4))
    scores = jnp.zeros((1, 50, 3))
    num, ob, osc, ocl = batched_nms(boxes, scores, 0.25, 0.5, 32, 10)
    assert int(num[0]) == 0


def test_nms_class_aware():
    # identical boxes, different classes -> both kept
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (2, 1))
    scores = np.zeros((2, 2), np.float32)
    scores[0, 0] = 0.9
    scores[1, 1] = 0.8
    num, ob, osc, ocl = batched_nms(
        jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
        0.25, 0.5, 8, 4)
    assert int(num[0]) == 2
    assert sorted(np.asarray(ocl[0][:2]).tolist()) == [0, 1]


def test_fused_decode_nms_matches_split_path():
    """The fused top-k decode+NMS must reproduce decode_predictions +
    batched_nms exactly (same candidates, boxes, scores, labels)."""
    from aicamera_tpu.models.yolov8 import decode_predictions

    rng = np.random.RandomState(7)
    b, nc, reg = 3, 6, 16
    input_hw = (64, 64)
    levels = []
    for s in (8, 16, 32):
        h, w = input_hw[0] // s, input_hw[1] // s
        bins = rng.randn(b, h, w, 4 * reg).astype(np.float32) * 2
        logits = rng.randn(b, h, w, nc).astype(np.float32) * 3
        levels.append((jnp.asarray(bins), jnp.asarray(logits)))

    boxes, scores = decode_predictions(levels, input_hw)
    ref = batched_nms(boxes, scores, score_threshold=0.25,
                      iou_threshold=0.5, top_k=48, max_det=16)
    got = fused_decode_nms(levels, score_threshold=0.25,
                           iou_threshold=0.5, top_k=48, max_det=16)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))


def test_fused_decode_nms_matches_split_path_bf16_multiseed():
    """Parity also in the production dtype (bf16 head outputs), across
    seeds: candidate selection on logits must order identically to
    selection on f32 sigmoid scores."""
    from aicamera_tpu.models.yolov8 import decode_predictions

    input_hw = (64, 64)
    for seed in range(5):
        rng = np.random.RandomState(100 + seed)
        levels = []
        for s in (8, 16, 32):
            h, w = input_hw[0] // s, input_hw[1] // s
            bins = jnp.asarray(
                rng.randn(2, h, w, 64).astype(np.float32) * 2
            ).astype(jnp.bfloat16)
            logits = jnp.asarray(
                rng.randn(2, h, w, 5).astype(np.float32) * 3
            ).astype(jnp.bfloat16)
            levels.append((bins, logits))
        boxes, scores = decode_predictions(levels, input_hw)
        ref = batched_nms(boxes, scores, score_threshold=0.25,
                          iou_threshold=0.5, top_k=32, max_det=12)
        got = fused_decode_nms(levels, score_threshold=0.25,
                               iou_threshold=0.5, top_k=32, max_det=12)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]),
                                      err_msg=f"seed {seed}")
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))


def test_fused_decode_nms_empty_scene():
    b, nc = 2, 3
    input_hw = (64, 64)
    levels = []
    for s in (8, 16, 32):
        h, w = input_hw[0] // s, input_hw[1] // s
        levels.append((jnp.zeros((b, h, w, 64)),
                       jnp.full((b, h, w, nc), -20.0)))
    num, ob, osc, ocl = fused_decode_nms(levels, score_threshold=0.25,
                                         iou_threshold=0.5, top_k=32,
                                         max_det=8)
    assert int(np.asarray(num).sum()) == 0


def test_crops_match_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 256, (120, 160, 3), np.uint8)
    boxes = jnp.asarray([[20.0, 10.0, 70.0, 110.0],
                         [-10.0, -10.0, 5.0, 5.0],
                         [0.0, 0.0, 0.0, 0.0]])
    crops, valid = extract_reid_crops(jnp.asarray(frame), boxes,
                                      out_hw=(128, 64),
                                      compute_dtype=jnp.float32)
    assert np.asarray(valid).tolist() == [True, True, False]
    ref = cv2.resize(frame[10:110, 20:70], (64, 128),
                     interpolation=cv2.INTER_LINEAR)
    ref = ref[..., ::-1].astype(np.float32) / 255.0
    ref = (ref - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    d = np.abs(np.asarray(crops[0], np.float32) - ref)
    assert d.mean() < 0.03  # cv2 fixed-point rounding

    # invalid crop produces zeros
    assert np.asarray(crops[2]).max() == 0.0


def test_fixpoint_greedy_keep_equals_sequential_scan():
    """The Jacobi-fixpoint keep set (one matvec per iteration, replacing
    round 1's 300-step sequential fori_loop) must equal the sequential
    greedy scan exactly, for any overlap structure."""
    from aicamera_tpu.ops.nms import _greedy_keep, _pairwise_iou_xyxy

    def sequential(ov, valid):
        k = len(valid)
        kept = np.zeros(k, bool)
        for i in range(k):
            kept[i] = valid[i] and not any(
                kept[j] and ov[j, i] for j in range(i))
        return kept

    rng = np.random.RandomState(42)
    for _ in range(20):
        k = int(rng.choice([3, 17, 64, 200]))
        c = rng.rand(k, 2).astype(np.float32) * 60
        wh = rng.rand(k, 2).astype(np.float32) * 40 + 4
        boxes = np.concatenate([c - wh / 2, c + wh / 2], -1)
        valid = rng.rand(k) > 0.15
        ov = np.asarray(_pairwise_iou_xyxy(jnp.asarray(boxes))) > 0.4
        ours = np.asarray(_greedy_keep(jnp.asarray(ov), jnp.asarray(valid)))
        np.testing.assert_array_equal(ours, sequential(ov, valid))


def test_fixpoint_greedy_worst_case_chain():
    """A length-K suppression chain (each box suppresses the next) is the
    slowest-converging input; the keep set must still be exact."""
    from aicamera_tpu.ops.nms import _greedy_keep

    k = 64  # chain: i suppresses i+1 only
    ov = np.zeros((k, k), bool)
    for i in range(k - 1):
        ov[i, i + 1] = ov[i + 1, i] = True
    valid = np.ones(k, bool)
    kept = np.asarray(_greedy_keep(jnp.asarray(ov), jnp.asarray(valid)))
    # greedy keeps every even-indexed element of the chain
    np.testing.assert_array_equal(kept, np.arange(k) % 2 == 0)
