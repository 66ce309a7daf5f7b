"""Ablate the config-2 gap: pipeline step vs bare detect on staged chunks.

Measures, with the exact benchmark methodology (staged HBM chunks, N
sequential dispatches, one device_get at the end):
  a) the full pipeline step (with_reid=False) — config 2's code path
  b) the same without the readback (block_until_ready only)
  c) bare fused detect (no compact/tracker scan)
  d) pipeline step with ReID (config 3's path)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLIP = Path("/root/reference/assets/aicamera_test_clip.mp4")


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu import config
    from aicamera_tpu.models.yolov8 import decode_predictions
    from aicamera_tpu.ops.nms import batched_nms
    from aicamera_tpu.ops.pallas_preprocess import preprocess_yolo_pallas
    from aicamera_tpu.ops.preprocess import letterbox_spec, scale_boxes_back
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    k = 96
    cap = cv2.VideoCapture(str(CLIP))
    frames = []
    while len(frames) < 480:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    arr = np.stack(frames)
    n = (len(arr) // k) * k
    chunks = []
    for i in range(0, n, k):
        c = jnp.asarray(arr[i:i + k])
        c.block_until_ready()
        chunks.append(c)
    hw = arr.shape[1:3]
    print(f"{n} frames, {len(chunks)} chunks of {k}, frame {hw}")

    def run(label, fn, readback=True, iters=3):
        best = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            outs = [fn(c) for c in chunks]
            if readback:
                jax.device_get(outs)
            else:
                jax.block_until_ready(outs)
            best = max(best, n / (time.perf_counter() - t0))
        print(f"{label:<38} {best:8.0f} fps   "
              f"{1e3 * n / best / len(chunks):6.1f} ms/chunk")

    # --- bare detect ----------------------------------------------------------
    spec = letterbox_spec(hw, config.YOLO_INPUT_SHAPE)
    pipe = TrackingPipeline(chunk_size=k, with_reid=False)
    model, params = pipe.yolo, pipe.yolo_params

    @jax.jit
    def detect(frames):
        x = jax.vmap(lambda f: preprocess_yolo_pallas(
            f, spec, out_dtype=jnp.bfloat16)[0])(frames)
        levels = model.apply(params, x)
        boxes_lb, scores = decode_predictions(levels, config.YOLO_INPUT_SHAPE)
        num, nboxes, nscores, nlabels = batched_nms(
            boxes_lb, scores,
            score_threshold=config.YOLO_NMS_SCORE_THRESHOLD,
            iou_threshold=config.YOLO_NMS_THRESHOLD,
            top_k=config.YOLO_NMS_TOPK, max_det=config.YOLO_MAX_DETECTIONS)
        return num, jax.vmap(lambda b: scale_boxes_back(b, spec))(nboxes), \
            nscores, nlabels

    jax.block_until_ready(detect(chunks[0]))
    run("bare detect (readback)", detect)
    run("bare detect (no readback)", detect, readback=False)

    # --- pipeline step, no reid -------------------------------------------------
    pipe.warm_up(hw)
    step = pipe._get_step(hw, k)
    fv = jnp.ones((k,), bool)

    def mk_state_fn(pipe, step, want):
        holder = {"state": pipe.state}

        def fn(c):
            holder["state"], det_outs, track_outs = step(
                pipe.yolo_params, pipe.reid_params, holder["state"], c, fv)
            return det_outs if want == "det" else track_outs
        return fn

    run("pipeline step no-reid (readback)", mk_state_fn(pipe, step, "det"))
    pipe.reset()
    run("pipeline step no-reid (no readback)",
        mk_state_fn(pipe, step, "det"), readback=False)

    del pipe
    pipe3 = TrackingPipeline(chunk_size=k)
    pipe3.warm_up(hw)
    step3 = pipe3._get_step(hw, k)
    run("pipeline step +reid (readback)", mk_state_fn(pipe3, step3, "track"))
    pipe3.reset()
    run("pipeline step +reid (no readback)",
        mk_state_fn(pipe3, step3, "track"), readback=False)


if __name__ == "__main__":
    main()
