"""Profile the tracker-core scan (the sequential part of the fused step).

Times the per-frame predict+update step and its pieces (costs, gating,
cascade, stage-2 IoU, KF update, lifecycle scatter) under a representative
load, as a lax.scan over a chunk — matching how runtime/pipeline.py runs it.

Usage: python scripts/profile_tracker.py [--chunk 96] [--dets 12]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=96)
    ap.add_argument("--dets", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu import config
    from aicamera_tpu.core import kalman, tracker
    from aicamera_tpu.core.assignment import matching_cascade, min_cost_matching
    from aicamera_tpu.core.costs import (appearance_cost_matrix,
                                         iou_cost_matrix, mean_to_tlwh,
                                         tlwh_to_xyah)
    from aicamera_tpu.core.state import (CONFIRMED, Detections, TrackerParams,
                                         init_state, make_detections)

    k, nd_real = args.chunk, args.dets
    p = TrackerParams(max_tracks=config.MAX_TRACKS,
                      max_detections=config.MAX_DETECTIONS,
                      nn_budget=config.DEEPSORT_NN_BUDGET,
                      max_age=config.DEEPSORT_MAX_AGE,
                      feature_dim=config.REID_FEATURE_DIM)
    print(f"backend={jax.default_backend()} chunk={k} dets/frame={nd_real} "
          f"T={p.max_tracks} N={p.max_detections} G={p.nn_budget}")

    rng = np.random.default_rng(0)

    def frame_dets(t):
        tlwh = np.zeros((p.max_detections, 4), np.float32)
        tlwh[:nd_real, 0] = 50 + 60 * np.arange(nd_real) + 2.0 * t
        tlwh[:nd_real, 1] = 100 + 10 * (np.arange(nd_real) % 4)
        tlwh[:nd_real, 2:] = (30, 60)
        feats = rng.standard_normal(
            (p.max_detections, p.feature_dim)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        valid = np.arange(p.max_detections) < nd_real
        return tlwh, feats, valid

    tlwh = np.stack([frame_dets(t)[0] for t in range(k)])
    feats = np.stack([frame_dets(t)[1] for t in range(k)])
    valid = np.stack([frame_dets(t)[2] for t in range(k)])
    dets_chunk = Detections(
        tlwh=jnp.asarray(tlwh),
        conf=jnp.asarray(0.9 * valid.astype(np.float32)),
        class_id=jnp.zeros((k, p.max_detections), jnp.int32),
        feature=jnp.asarray(feats),
        has_feature=jnp.asarray(valid),
        valid=jnp.asarray(valid))

    @jax.jit
    def scan_chunk(state, dets):
        def body(st, d):
            st = tracker.predict(st, p)
            st = tracker.update(st, d, p)
            return st, tracker.get_outputs(st)
        return jax.lax.scan(body, state, dets)

    # warm the state: run one chunk so tracks exist and are confirmed
    state0 = init_state(p)
    state_warm, _ = scan_chunk(state0, dets_chunk)
    state_warm = jax.block_until_ready(state_warm)

    t_scan = timed(lambda d: scan_chunk(state_warm, d), dets_chunk)
    print(f"tracker scan: {t_scan * 1e3:8.2f} ms/chunk "
          f"{t_scan * 1e6 / k:8.1f} us/frame  ({k / t_scan:.0f} fps)")

    # --- single-frame pieces --------------------------------------------------
    one = jax.tree.map(lambda x: x[0], dets_chunk)
    st = jax.block_until_ready(tracker.predict(state_warm, p))

    pieces = {}
    meas_xyah = tlwh_to_xyah(one.tlwh)
    gal_idx = jnp.arange(st.gallery.shape[1])
    gallery_valid = gal_idx[None, :] < st.gallery_count[:, None]

    pieces["appearance_cost"] = timed(jax.jit(
        lambda: appearance_cost_matrix(st.gallery, gallery_valid,
                                       one.feature, one.has_feature)))
    pieces["gating"] = timed(jax.jit(
        lambda: kalman.gating_distance(st.mean, st.cov, meas_xyah)))
    app = appearance_cost_matrix(st.gallery, gallery_valid, one.feature,
                                 one.has_feature)
    confirmed = st.active & (st.state == CONFIRMED)
    pieces["cascade"] = timed(jax.jit(
        lambda: matching_cascade(app, st.tsu, confirmed, one.valid,
                                 p.max_cosine_distance, p.max_age)))
    iou_c = iou_cost_matrix(mean_to_tlwh(st.mean), one.tlwh)
    pieces["iou_stage"] = timed(jax.jit(
        lambda: min_cost_matching(iou_c, confirmed, one.valid,
                                  jnp.float32(p.max_iou_distance))))
    pieces["kf_update_all"] = timed(jax.jit(
        lambda: kalman.update(st.mean, st.cov, meas_xyah[:1].repeat(
            p.max_tracks, 0))))
    pieces["kf_predict"] = timed(jax.jit(
        lambda: kalman.predict(st.mean, st.cov)))
    pieces["full_update_1f"] = timed(
        lambda d: tracker.update(tracker.predict(state_warm, p), d, p), one)

    for name, t in pieces.items():
        print(f"{name:<18} {t * 1e6:8.1f} us")


if __name__ == "__main__":
    main()
