"""Why is realistic-load tracking (config 9) slower than the 64-det
worst case (config 7)? Stage ablation on synthetic frames with trained
weights, plus a direct measurement of the NMS suppression-fixpoint depth
(`ops/nms.py::_greedy_keep` is a data-dependent while_loop: its iteration
count is the suppression DAG depth, which trained weights on dense scenes
could blow up).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WEIGHTS = Path(__file__).resolve().parent.parent / \
    "models" / "detection" / "yolov8n_synthetic.msgpack"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu import config
    from aicamera_tpu.models.yolov8 import YOLOv8  # noqa: F401
    from aicamera_tpu.ops.nms import (_pairwise_iou_xyxy, fused_decode_nms,
                                      _CLASS_OFFSET)
    from aicamera_tpu.ops.pallas_preprocess import preprocess_yolo_pallas
    from aicamera_tpu.ops.preprocess import letterbox_spec, preprocess_yolo
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

    k = 96
    world = TemporalWorld(WorldSpec(max_objects=10, presence=1.0), seed=4,
                          speed=3.0)
    frames = [world.step()[0] for _ in range(288)]
    arr = np.stack(frames)
    chunks = []
    for i in range(0, 288, k):
        c = jnp.asarray(arr[i:i + k])
        c.block_until_ready()
        chunks.append(c)
    hw = arr.shape[1:3]
    n = len(chunks) * k
    spec = letterbox_spec(hw, config.YOLO_INPUT_SHAPE)

    def bench(label, launch, iters=3):
        best = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            outs = launch()
            jax.device_get(outs)
            best = max(best, n / (time.perf_counter() - t0))
        print(f"{label:<40} {best:8.0f} fps  "
              f"{1e3 * n / best / len(chunks):7.1f} ms/chunk", flush=True)

    for tag, wpath in (("trained", str(WEIGHTS)), ("random", None)):
        pipe = TrackingPipeline(chunk_size=k, yolo_weights=wpath)
        pipe.warm_up(hw)
        step = pipe._get_step(hw, k)
        fv = jnp.ones((k,), bool)
        pre = (preprocess_yolo_pallas
               if jax.default_backend() == "tpu" else preprocess_yolo)

        @jax.jit
        def detect(params, fr):
            x = jax.vmap(lambda f: pre(f, spec, out_dtype=jnp.bfloat16)[0])(fr)
            levels = pipe.yolo.apply(params, x)
            return fused_decode_nms(
                levels, score_threshold=config.YOLO_NMS_SCORE_THRESHOLD,
                iou_threshold=pipe.nms_threshold,
                top_k=config.YOLO_NMS_TOPK,
                max_det=config.YOLO_MAX_DETECTIONS)

        @jax.jit
        def decode_only(params, fr):
            """Same, but suppression replaced by threshold-count: isolates
            the greedy-keep fixpoint cost from the rest of the NMS."""
            x = jax.vmap(lambda f: pre(f, spec, out_dtype=jnp.bfloat16)[0])(fr)
            levels = pipe.yolo.apply(params, x)
            # candidate scores only (no NMS): monotone stand-in
            logits = jnp.concatenate(
                [cl.reshape(cl.shape[0], -1, cl.shape[-1])
                 for _, cl in levels], axis=1)
            return jnp.sum(jax.nn.sigmoid(
                jnp.max(logits, -1).astype(jnp.float32)) > 0.25, axis=1)

        bench(f"{tag}: decode only (no NMS)",
              lambda: [decode_only(pipe.yolo_params, c) for c in chunks])
        bench(f"{tag}: full detect (with NMS)",
              lambda: [detect(pipe.yolo_params, c) for c in chunks])

        def full():
            pipe.reset()
            st = pipe.state
            outs = []
            for c in chunks:
                st, _, track_outs = step(pipe.yolo_params, pipe.reid_params,
                                         st, c, fv)
                outs.append(track_outs)
            return outs
        bench(f"{tag}: full step (reid+scan)", full)

        # Same pipeline with the ReID embed removed: isolates the tracker
        # scan (predict/cascade/LAPJV/update with IoU-only association)
        # from the crop-gather + embedder forward.
        pipe_noreid = TrackingPipeline(chunk_size=k, yolo_weights=wpath,
                                       with_reid=False)
        pipe_noreid.warm_up(hw)
        step_nr = pipe_noreid._get_step(hw, k)

        def full_noreid():
            pipe_noreid.reset()
            st = pipe_noreid.state
            outs = []
            for c in chunks:
                st, _, track_outs = step_nr(
                    pipe_noreid.yolo_params, pipe_noreid.reid_params, st, c,
                    fv)
                outs.append(track_outs)
            return outs
        bench(f"{tag}: full step (no reid)", full_noreid)

        # ---- fixpoint depth on the first chunk's candidates -------------
        num, boxes, scores, labels = map(np.asarray,
                                         detect(pipe.yolo_params, chunks[0]))
        print(f"{tag}: post-NMS dets/frame mean {num.mean():.1f} "
              f"max {num.max()}")

    # Host-side: measure the Jacobi fixpoint depth on trained outputs by
    # recomputing the candidate top-300 with the split path.
    from aicamera_tpu.models.yolov8 import decode_predictions
    pipe = TrackingPipeline(chunk_size=k, yolo_weights=str(WEIGHTS))

    @jax.jit
    def candidates(fr):
        pre2 = (preprocess_yolo_pallas
                if jax.default_backend() == "tpu" else preprocess_yolo)
        x = jax.vmap(lambda f: pre2(f, spec, out_dtype=jnp.bfloat16)[0])(fr)
        levels = pipe.yolo.apply(pipe.yolo_params, x)
        boxes, sc = decode_predictions(levels, config.YOLO_INPUT_SHAPE)
        best = jnp.max(sc, -1)
        cls = jnp.argmax(sc, -1)
        s, i = jax.lax.top_k(jnp.where(best >= 0.25, best, -1.0), 300)
        b = jnp.take_along_axis(boxes, i[..., None], axis=1)
        c = jnp.take_along_axis(cls, i, axis=1)
        return b, s, c

    b, s, c = map(np.asarray, candidates(chunks[0]))
    depths = []
    for j in range(0, k, 8):
        valid = s[j] > 0
        shifted = b[j] + (c[j].astype(np.float32) * _CLASS_OFFSET)[:, None]
        ov = np.asarray(_pairwise_iou_xyxy(jnp.asarray(shifted))) > 0.5
        lower = np.tril(np.ones((300, 300), bool), -1).T
        ovl = (ov & lower).astype(np.float32)
        kept, prev, it = valid.copy(), ~valid, 0
        while it < 300 and (kept != prev).any():
            sup = (kept.astype(np.float32) @ ovl) > 0
            kept, prev = valid & ~sup, kept
            it += 1
        depths.append(it)
    print("greedy-keep fixpoint iterations per frame (sampled):", depths)


if __name__ == "__main__":
    main()
