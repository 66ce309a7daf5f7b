"""Is the tracker scan slow per se, or only when fused with detect?

Stages the real clip's compacted detection stream (from detect+compact),
then times the tracker scan as its OWN jitted program (donated state) on
that stream. Compares against the fused detect+scan number from
profile_step_parts.py.
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
    from aicamera_tpu.core.state import Detections, init_state

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
    hw = arr.shape[1:3]

    pipe = TrackingPipeline(chunk_size=k, with_reid=False)
    p = pipe.tracker_params
    step = pipe._get_step(hw, k)
    fv = jnp.ones((k,), bool)

    # Collect the real compacted det stream chunk by chunk (host round trip,
    # untimed), then restage.
    det_streams = []
    state = pipe.state
    for i in range(0, n, k):
        c = jnp.asarray(arr[i:i + k])
        state, det_outs, _ = step(pipe.yolo_params, pipe.reid_params,
                                  state, c, fv)
        num, boxes_f, scores, labels, det_valid = det_outs
        det_streams.append(jax.device_get((num, boxes_f, scores, labels)))

    # Rebuild compacted det chunks on host with the same compaction logic.
    from aicamera_tpu import config
    tset = set(config.CLASS_IDS_TO_TRACK)
    n_det = p.max_detections
    chunks_d = []
    for num, boxes, scores, labels in det_streams:
        tlwh = np.zeros((k, n_det, 4), np.float32)
        conf = np.zeros((k, n_det), np.float32)
        cls = np.zeros((k, n_det), np.int32)
        valid = np.zeros((k, n_det), bool)
        for f in range(k):
            m = (np.arange(boxes.shape[1]) < num[f]) & \
                (scores[f] >= pipe.conf_threshold) & \
                np.isin(labels[f], list(tset)) & \
                (scores[f] >= pipe.min_detection_confidence)
            idx = np.flatnonzero(m)[:n_det]
            b = boxes[f][idx]
            tlwh[f, :len(idx), :2] = b[:, :2]
            tlwh[f, :len(idx), 2:] = b[:, 2:] - b[:, :2]
            conf[f, :len(idx)] = scores[f][idx]
            cls[f, :len(idx)] = labels[f][idx]
            valid[f, :len(idx)] = True
        dets = Detections(
            tlwh=jnp.asarray(tlwh), conf=jnp.asarray(conf),
            class_id=jnp.asarray(cls),
            feature=jnp.zeros((k, n_det, p.feature_dim), jnp.float32),
            has_feature=jnp.zeros((k, n_det), bool),
            valid=jnp.asarray(valid))
        jax.block_until_ready(dets)
        chunks_d.append(dets)
    print(f"staged {len(chunks_d)} det chunks; "
          f"valid/frame mean "
          f"{np.mean([np.asarray(d.valid).sum(1).mean() for d in chunks_d]):.2f}")

    @jax.jit
    def scan_only(state, dets):
        def body(st, d):
            st = core_tracker.predict(st, p)
            st = core_tracker.update(st, d, p)
            return st, core_tracker.get_outputs(st)
        return jax.lax.scan(body, state, dets)

    scan_don = jax.jit(scan_only, donate_argnums=(0,))

    for label, fn in (("scan (no donate)", scan_only),
                      ("scan (donated)", scan_don)):
        st = jax.block_until_ready(init_state(p))
        # warm/compile
        st, _ = fn(st, chunks_d[0])
        jax.block_until_ready(st)
        best = 0.0
        for _ in range(3):
            st = jax.block_until_ready(init_state(p))
            t0 = time.perf_counter()
            outs = []
            for d in chunks_d:
                st, o = fn(st, d)
                outs.append(o)
            jax.block_until_ready((st, outs))
            best = max(best, n / (time.perf_counter() - t0))
        print(f"{label:<20} {best:9.0f} fps   "
              f"{1e3 * n / best / len(chunks_d):7.2f} ms/chunk   "
              f"{1e6 * len(chunks_d) / best / n * n / len(chunks_d):6.1f} "
              f"us/frame" if False else
              f"{label:<20} {best:9.0f} fps   "
              f"{1e3 * n / best / len(chunks_d):7.2f} ms/chunk")


if __name__ == "__main__":
    main()
