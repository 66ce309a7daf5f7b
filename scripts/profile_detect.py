"""Stage-level profile of the detect path on the real device.

Compiles each stage of the fused detect step separately (preprocess, YOLO
forward, decode, NMS, box rescale) at the benchmark chunk size and times
them with staged device inputs, plus XLA cost analysis (FLOPs / bytes) per
stage for the roofline numbers in docs/ROOFLINE.md.

Usage: python scripts/profile_detect.py [--chunk 96] [--variant n]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def cost(fn, *args):
    import jax
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0)), float(c.get("bytes accessed", 0))
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=96)
    ap.add_argument("--variant", type=str, default="n")
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu import config
    from aicamera_tpu.models.yolov8 import decode_predictions
    from aicamera_tpu.ops.nms import batched_nms
    from aicamera_tpu.ops.pallas_preprocess import preprocess_yolo_pallas
    from aicamera_tpu.ops.preprocess import (letterbox_spec, preprocess_yolo,
                                             scale_boxes_back)
    from aicamera_tpu.runtime.params import resolve_yolo_params

    k = args.chunk
    frame_hw = tuple(args.hw)
    input_hw = config.YOLO_INPUT_SHAPE
    spec = letterbox_spec(frame_hw, input_hw)
    model, params = resolve_yolo_params(args.variant)
    backend = jax.default_backend()
    print(f"backend={backend} chunk={k} frame={frame_hw} "
          f"input={input_hw} variant={args.variant}")

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (k, *frame_hw, 3), np.uint8))
    frames.block_until_ready()

    pre = preprocess_yolo_pallas if backend == "tpu" else preprocess_yolo

    @jax.jit
    def stage_pre(frames):
        return jax.vmap(lambda f: pre(f, spec, out_dtype=jnp.bfloat16)[0])(
            frames)

    @jax.jit
    def stage_fwd(params, x):
        return model.apply(params, x)

    @jax.jit
    def stage_decode(levels):
        return decode_predictions(levels, input_hw)

    @jax.jit
    def stage_nms(boxes, scores):
        return batched_nms(boxes, scores,
                           score_threshold=config.YOLO_NMS_SCORE_THRESHOLD,
                           iou_threshold=config.YOLO_NMS_THRESHOLD,
                           top_k=config.YOLO_NMS_TOPK,
                           max_det=config.YOLO_MAX_DETECTIONS)

    @jax.jit
    def stage_scale(nboxes):
        return jax.vmap(lambda b: scale_boxes_back(b, spec))(nboxes)

    @jax.jit
    def full(params, frames):
        x = jax.vmap(lambda f: pre(f, spec, out_dtype=jnp.bfloat16)[0])(frames)
        levels = model.apply(params, x)
        boxes_lb, scores = decode_predictions(levels, input_hw)
        num, nboxes, nscores, nlabels = batched_nms(
            boxes_lb, scores,
            score_threshold=config.YOLO_NMS_SCORE_THRESHOLD,
            iou_threshold=config.YOLO_NMS_THRESHOLD,
            top_k=config.YOLO_NMS_TOPK, max_det=config.YOLO_MAX_DETECTIONS)
        return num, stage_scale(nboxes), nscores, nlabels

    x = stage_pre(frames)
    levels = stage_fwd(params, x)
    boxes_lb, scores = stage_decode(levels)

    rows = []
    t, _ = timed(stage_pre, frames)
    rows.append(("preprocess", t, *cost(lambda f: stage_pre(f), frames)))
    t, _ = timed(stage_fwd, params, x)
    rows.append(("yolo_forward", t,
                 *cost(lambda p, xx: stage_fwd(p, xx), params, x)))
    t, _ = timed(stage_decode, levels)
    rows.append(("decode", t, *cost(lambda l: stage_decode(l), levels)))
    t, _ = timed(stage_nms, boxes_lb, scores)
    rows.append(("nms", t, *cost(lambda b, s: stage_nms(b, s),
                                 boxes_lb, scores)))
    t_full, _ = timed(full, params, frames)
    rows.append(("FULL detect", t_full,
                 *cost(lambda p, f: full(p, f), params, frames)))

    print(f"{'stage':<14}{'ms/chunk':>10}{'ms/frame':>10}{'fps':>9}"
          f"{'GFLOP/fr':>10}{'GB/fr':>8}{'TFLOP/s':>9}{'GB/s':>8}")
    for name, t, fl, by in rows:
        print(f"{name:<14}{t * 1e3:>10.2f}{t * 1e3 / k:>10.3f}"
              f"{k / t:>9.0f}{fl / k / 1e9:>10.2f}{by / k / 1e9:>8.3f}"
              f"{fl / t / 1e12:>9.2f}{by / t / 1e9:>8.0f}")
    sum_stages = sum(r[1] for r in rows[:-1])
    print(f"sum(stages) = {sum_stages * 1e3:.2f} ms/chunk vs full "
          f"{t_full * 1e3:.2f} (fusion gain {1 - t_full / sum_stages:+.0%})")


if __name__ == "__main__":
    main()
