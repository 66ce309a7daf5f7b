"""Does the tracker scan's cost scale with padded capacity (T, n_det)?

Decides whether capacity-bucketed scan variants (run the chunk's scan at
T=32 when few slots are live, fall back to T=128) are worth building: if
the scan under realistic trained-like load is latency-bound (dozens of
small sequential ops per frame), shrinking the padded shapes buys
nothing; if it is throughput-bound, it scales ~linearly with T.

Feeds the SAME synthetic ground-truth detection stream (~9 live ids per
frame, unit appearance features per identity — the load profile of
benchmark config 9 without detector noise) through scan-only programs at
several (max_tracks, max_detections) paddings and times each with the
axon-safe pattern (chained donated state, one device_get at the end).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu.core import tracker as core_tracker
    from aicamera_tpu.core.state import Detections, TrackerParams, init_state
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

    k, n_chunks = 96, 3
    world = TemporalWorld(WorldSpec(max_objects=10, presence=1.0), seed=4,
                          speed=3.0)
    feat_dim = 512
    rng = np.random.RandomState(0)
    id_feats = rng.rand(64, feat_dim).astype(np.float32)
    id_feats /= np.linalg.norm(id_feats, axis=1, keepdims=True)

    frames = [world.step() for _ in range(k * n_chunks)]

    def stage(n_det):
        chunks = []
        for c0 in range(0, k * n_chunks, k):
            tlwh = np.zeros((k, n_det, 4), np.float32)
            conf = np.zeros((k, n_det), np.float32)
            cls = np.zeros((k, n_det), np.int32)
            feats = np.zeros((k, n_det, feat_dim), np.float32)
            valid = np.zeros((k, n_det), bool)
            for f in range(k):
                _, b, ids, c, v = frames[c0 + f]
                idx = np.flatnonzero(v)[:n_det]
                m = len(idx)
                tlwh[f, :m, :2] = b[idx, :2]
                tlwh[f, :m, 2:] = b[idx, 2:] - b[idx, :2]
                conf[f, :m] = 0.9
                cls[f, :m] = 0
                feats[f, :m] = id_feats[ids[idx] % 64]
                valid[f, :m] = True
            d = Detections(tlwh=jnp.asarray(tlwh), conf=jnp.asarray(conf),
                           class_id=jnp.asarray(cls),
                           feature=jnp.asarray(feats),
                           has_feature=jnp.asarray(valid),
                           valid=jnp.asarray(valid))
            jax.block_until_ready(d)
            chunks.append(d)
        return chunks

    def bench(max_tracks, n_det, chunks):
        p = TrackerParams(max_tracks=max_tracks, max_detections=n_det,
                          nn_budget=100, feature_dim=feat_dim, max_age=70)

        def scan_only(state, dets):
            def body(st, d):
                st = core_tracker.predict(st, p)
                st = core_tracker.update(st, d, p)
                return st, core_tracker.get_outputs(st)
            return jax.lax.scan(body, state, dets)

        fn = jax.jit(scan_only, donate_argnums=(0,))
        st = init_state(p)
        st, o = fn(st, chunks[0])       # compile + warm
        jax.device_get(jax.tree.leaves(o)[0][:1])
        runs = []
        for _ in range(3):
            st = init_state(p)
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            outs = []
            for d in chunks:
                st, o = fn(st, d)
                outs.append(o[1])       # ids only — small readback
            jax.device_get(outs)
            runs.append(time.perf_counter() - t0)
        ms = sorted(runs)[1] * 1e3 / len(chunks)
        print(f"T={max_tracks:4d} n_det={n_det:3d}: {ms:7.2f} ms/chunk "
              f"({1e3 * k / ms:6.0f} fps scan-only)")
        return ms

    for n_det in (64, 16):
        chunks = stage(n_det)
        for t in (128, 64, 32):
            bench(t, n_det, chunks)


if __name__ == "__main__":
    main()
