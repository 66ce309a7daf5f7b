"""Stage-level profile of the detect path on the real device.

Uses the axon-safe methodology (scripts/axon_timing.py): distinct input
buffers per dispatch, outputs folded to scalars device-side, one
device_get at the end. ``block_until_ready`` does NOT synchronize on the
tunneled runtime, and repeat dispatches of the same (executable, buffer)
pair short-circuit — naive timing loops measure enqueue, not compute.

Usage: python scripts/profile_detect.py [--chunk 96] [--variant n] [--n 10]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from axon_timing import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=96)
    ap.add_argument("--variant", type=str, default="n")
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    ap.add_argument("--n", type=int, default=10,
                    help="distinct input buffers per stage")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu import config
    from aicamera_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    from aicamera_tpu.models.yolov8 import decode_predictions
    from aicamera_tpu.ops.nms import batched_nms, fused_decode_nms
    from aicamera_tpu.ops.pallas_preprocess import preprocess_yolo_pallas
    from aicamera_tpu.ops.preprocess import (letterbox_spec, preprocess_yolo,
                                             scale_boxes_back)
    from aicamera_tpu.runtime.params import resolve_yolo_params

    k = args.chunk
    n = args.n
    frame_hw = tuple(args.hw)
    input_hw = config.YOLO_INPUT_SHAPE
    spec = letterbox_spec(frame_hw, input_hw)
    model, params = resolve_yolo_params(args.variant)
    print(f"backend={jax.default_backend()} chunk={k} frame={frame_hw} "
          f"input={input_hw} variant={args.variant} n={n}")

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 255, (k, *frame_hw, 3), np.uint8))
    base.block_until_ready()
    _salt = iter(range(1, 10000))

    @jax.jit
    def _perturb(c, i):
        return c + i.astype(jnp.uint8)  # wrapping add: distinct content

    def fresh_chunks(m):
        """m distinct device-resident chunks from ONE tunnel upload."""
        out = [(_perturb(base, jnp.uint32(next(_salt))),) for _ in range(m)]
        jax.block_until_ready(out)
        return out

    rows = []

    def pre_fn(pre):
        return jax.jit(lambda fr: jax.vmap(
            lambda f: pre(f, spec, out_dtype=jnp.bfloat16)[0])(fr))

    # --- preprocess variants -------------------------------------------------
    chunks = fresh_chunks(n + 1)
    rows.append(("preprocess_xla", measure(pre_fn(preprocess_yolo), chunks)))
    chunks = fresh_chunks(n + 1)
    pallas_pre = pre_fn(preprocess_yolo_pallas)
    rows.append(("preprocess_pallas", measure(pallas_pre, chunks)))

    # --- forward -------------------------------------------------------------
    xs = [(pallas_pre(c),) for (c,) in chunks[:n]]
    fwd = jax.jit(lambda x: model.apply(params, x))
    rows.append(("yolo_forward", measure(fwd, xs)))

    # --- decode + nms variants ----------------------------------------------
    levels = [(fwd(x),) for (x,) in xs]
    del xs

    split = jax.jit(lambda lv: batched_nms(
        *decode_predictions(lv, input_hw),
        score_threshold=config.YOLO_NMS_SCORE_THRESHOLD,
        iou_threshold=config.YOLO_NMS_THRESHOLD,
        top_k=config.YOLO_NMS_TOPK, max_det=config.YOLO_MAX_DETECTIONS))
    rows.append(("decode+nms split", measure(split, levels)))
    fused = jax.jit(lambda lv: fused_decode_nms(
        lv, score_threshold=config.YOLO_NMS_SCORE_THRESHOLD,
        iou_threshold=config.YOLO_NMS_THRESHOLD,
        top_k=config.YOLO_NMS_TOPK, max_det=config.YOLO_MAX_DETECTIONS))
    rows.append(("decode+nms fused", measure(fused, levels)))
    del levels

    # --- full detect programs ------------------------------------------------
    def full(pre, dec):
        def fn(frames):
            x = jax.vmap(lambda f: pre(f, spec, out_dtype=jnp.bfloat16)[0])(
                frames)
            lv = model.apply(params, x)
            num, nboxes, nscores, nlabels = dec(lv)
            return num, jax.vmap(lambda b: scale_boxes_back(b, spec))(nboxes), \
                nscores, nlabels
        return jax.jit(fn)

    chunks = fresh_chunks(n + 1)
    rows.append(("FULL split", measure(full(preprocess_yolo_pallas, split),
                                       chunks)))
    chunks = fresh_chunks(n + 1)
    rows.append(("FULL fused", measure(full(preprocess_yolo_pallas, fused),
                                       chunks)))

    print(f"{'stage':<20}{'ms/chunk':>10}{'ms/frame':>10}{'fps':>9}")
    for name, t in rows:
        print(f"{name:<20}{t * 1e3:>10.2f}{t * 1e3 / k:>10.3f}{k / t:>9.0f}")


if __name__ == "__main__":
    main()
