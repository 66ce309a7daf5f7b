"""Break the fused pipeline step into parts over the real clip stream.

 a) detect only                      (baseline)
 b) detect + compact                 (isolates compact_dets)
 c) detect + compact + tracker scan  (isolates the scan under real load)
 d) detection-load stats             (how many trackable dets/frame the
                                      untrained weights actually produce)
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

    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu.core import tracker as core_tracker
    from aicamera_tpu.core.state import Detections

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

    pipe = TrackingPipeline(chunk_size=k, with_reid=False)
    p = pipe.tracker_params

    # Rebuild the internals of _make_chunk_step piecewise.
    mk = pipe._make_chunk_step.__wrapped__ if hasattr(
        pipe._make_chunk_step, "__wrapped__") else None
    # simpler: re-create the closures by calling the private builder pieces
    from aicamera_tpu import config
    from aicamera_tpu.models.yolov8 import decode_predictions
    from aicamera_tpu.ops.nms import batched_nms
    from aicamera_tpu.ops.pallas_preprocess import preprocess_yolo_pallas
    from aicamera_tpu.ops.preprocess import letterbox_spec, scale_boxes_back

    spec = letterbox_spec(hw, pipe.input_shape)
    n_det = p.max_detections
    track_ids = jnp.asarray(config.CLASS_IDS_TO_TRACK, jnp.int32)

    def detect_batch(yolo_params, frames):
        x = jax.vmap(lambda f: preprocess_yolo_pallas(
            f, spec, out_dtype=jnp.bfloat16)[0])(frames)
        levels = pipe.yolo.apply(yolo_params, x)
        boxes_lb, scores = decode_predictions(levels, pipe.input_shape)
        num, nboxes, nscores, nlabels = batched_nms(
            boxes_lb, scores,
            score_threshold=config.YOLO_NMS_SCORE_THRESHOLD,
            iou_threshold=pipe.nms_threshold,
            top_k=config.YOLO_NMS_TOPK, max_det=config.YOLO_MAX_DETECTIONS)
        boxes_frame = jax.vmap(lambda b: scale_boxes_back(b, spec))(nboxes)
        return num, boxes_frame, nscores, nlabels

    def compact_dets(num, boxes, scores, labels):
        present = jnp.arange(boxes.shape[0]) < num
        det_valid = present & (scores >= pipe.conf_threshold)
        trackable = jnp.any(labels[:, None] == track_ids[None, :], axis=1)
        elig = det_valid & trackable & \
            (scores >= pipe.min_detection_confidence)
        rank = jnp.cumsum(elig) - 1
        slot = jnp.where(elig & (rank < n_det), rank, n_det)

        def compact(vals):
            a = jnp.zeros((n_det + 1,) + vals.shape[1:], vals.dtype)
            return a.at[slot].set(vals)[:n_det]

        return (compact(boxes), compact(scores),
                compact(labels.astype(jnp.int32)), compact(elig), det_valid)

    @jax.jit
    def step_a(yp, frames):
        return detect_batch(yp, frames)

    @jax.jit
    def step_b(yp, frames):
        num, boxes_f, scores, labels = detect_batch(yp, frames)
        return jax.vmap(compact_dets)(num, boxes_f, scores, labels)

    @jax.jit
    def step_c(yp, state, frames):
        num, boxes_f, scores, labels = detect_batch(yp, frames)
        d_xyxy, d_conf, d_cls, d_valid, det_valid = jax.vmap(compact_dets)(
            num, boxes_f, scores, labels)
        d_feats = jnp.zeros((k, n_det, p.feature_dim), jnp.float32)
        d_hasfeat = jnp.zeros((k, n_det), jnp.bool_)
        tlwh = jnp.concatenate(
            [d_xyxy[..., :2], d_xyxy[..., 2:] - d_xyxy[..., :2]], axis=-1)

        def body(st, per):
            f_tlwh, f_conf, f_cls, f_feat, f_hf, f_valid = per
            dets = Detections(tlwh=f_tlwh, conf=f_conf, class_id=f_cls,
                              feature=f_feat, has_feature=f_hf,
                              valid=f_valid)
            st = core_tracker.predict(st, p)
            st = core_tracker.update(st, dets, p)
            return st, core_tracker.get_outputs(st)

        state, outs = jax.lax.scan(
            body, state, (tlwh, d_conf, d_cls, d_feats, d_hasfeat, d_valid))
        return state, outs

    def run(label, fn, iters=3):
        best = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            outs = [fn(c) for c in chunks]
            jax.block_until_ready(outs)
            best = max(best, n / (time.perf_counter() - t0))
        print(f"{label:<30} {best:8.0f} fps  "
              f"{1e3 * n / best / len(chunks):6.1f} ms/chunk")

    jax.block_until_ready(step_a(pipe.yolo_params, chunks[0]))
    jax.block_until_ready(step_b(pipe.yolo_params, chunks[0]))
    from aicamera_tpu.core.state import init_state
    st0 = init_state(p)
    st0 = jax.block_until_ready(step_c(pipe.yolo_params, st0, chunks[0]))[0]

    run("a) detect", lambda c: step_a(pipe.yolo_params, c))
    run("b) detect+compact", lambda c: step_b(pipe.yolo_params, c))
    holder = {"s": st0}

    def c_fn(c):
        holder["s"], outs = step_c(pipe.yolo_params, holder["s"], c)
        return outs
    run("c) detect+compact+scan", c_fn)

    # --- load stats -------------------------------------------------------------
    stats = []
    for c in chunks:
        _, _, _, d_valid, det_valid = jax.device_get(
            step_b(pipe.yolo_params, c))
        stats.append((det_valid.sum(1), d_valid.sum(1)))
    raw = np.concatenate([s[0] for s in stats])
    trk = np.concatenate([s[1] for s in stats])
    print(f"raw dets/frame: mean {raw.mean():.1f} max {raw.max()}  "
          f"trackable: mean {trk.mean():.1f} max {trk.max()}")
    st = jax.device_get(holder["s"])
    print(f"final track slots active: {st.active.sum()}, next_id "
          f"{st.next_id}")


if __name__ == "__main__":
    main()
