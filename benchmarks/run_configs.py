"""Benchmark harness for the five BASELINE.json configs, plus extras.

  1. YOLOv8n single-frame detection (CPU backend)
  2. YOLOv8n detection loop over the test clip with decode+NMS
  3. Full YOLOv8n + DeepSORT ReID tracking on the clip (= bench.py headline)
  4. Batched multi-stream tracking: 8x 720p streams, batched ReID crops
  5. YOLOv8m @ 1080p crowded-scene tracking (256 track slots, 100 dets)
  6. Streaming end-to-end incl. host decode + upload (CLI path)
  7. Worst-case load: saturated 64-detection slate every frame
  8. Single-frame (chunk-1) latency p50/p99 — webcam/serving mode
  9. Realistic load: self-trained detector+embedder, MOTA-checked
 10. 8x540p multi-stream under realistic trained load
 11. Raw YOLOv8n forward (reference 'raw engine speed' row, ~400+ FPS)
 12. Raw ReID embed (reference raw engine row, ~600+ crops/s)
 13. YOLOv8x at 4K source / 1280x1280 input — extreme single-chip scale
 14. Letterbox `auto` minimum-rectangle canvas vs square (paired A/B)
 15. ByteTrack on the clip (alternative tracker core, no ReID stage)
 16. ByteTrack under the realistic trained load, MOTA-checked (vs config 9)
 17. OC-SORT on the clip (observation-centric tracker, no ReID stage)
 18. OC-SORT under the realistic trained load, MOTA-checked (vs 9/16)
 19. DeepSORT with the EMA appearance bank (vs config 9's FIFO ring)
 20. Camera-motion compensation on a panning camera (quality + overhead)
 21. NSA Kalman updates under the realistic trained load (paired A/B vs 9)
 22. BoT-SORT (ByteTrack + appearance) under the realistic trained load
 23. StrongSORT preset (EMA+NSA+GMC) under the realistic trained load
 24. Deep OC-SORT (adaptively weighted appearance) under the trained load
 25. Tiled (SAHI-style) 4K detection: FPS + mosaic AP rescue vs full-frame
 26. Multi-tenant serving: mixed-rate tenants + closed-loop saturation
 27. Int8 (W8A8) ReID A/B: raw crops/s, worst-case FPS, quality gates
 28. Int8 static-calibrated detector A/B: raw fwd, clip FPS, AP50 gate
 29. Crowd-scale quality: ~85 live identities, MOT/HOTA at 192 slots
     (all four tracker families; crowd ReID checkpoint when present)
 30. Track-table overflow under scoring: >=128 visible identities vs 192
     slots, with a 384-slot headroom control isolating the overflow cost

Usage:  python benchmarks/run_configs.py --config 3 [--frames 500]
        python benchmarks/run_configs.py --all [--out results.jsonl]

Each config prints one JSON line. Frames are staged to device HBM before
the timed region (the reference's FPS accounting likewise excludes video
decode, aicamera_tracker.py:175,201-207).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLIP = Path("/root/reference/assets/aicamera_test_clip.mp4")


def _load_clip(n: int | None = None, hw=None):
    import cv2
    import numpy as np
    cap = cv2.VideoCapture(str(CLIP))
    frames = []
    while n is None or len(frames) < n:
        ok, f = cap.read()
        if not ok:
            break
        if hw is not None and f.shape[:2] != tuple(hw):
            f = cv2.resize(f, (hw[1], hw[0]))
        frames.append(f)
    cap.release()
    return np.stack(frames)


_OUT_PATH: Path | None = None
_LAST_PROBE_MS: float | None = None
_PROBE_SEQ = [0]


def _probe_ms() -> float:
    """Median of 3 tiny distinct-buffer device round trips (ms) — the
    tunnel-health probe (CLAUDE.md: transfers degrade ~1 s under
    sustained load). Recorded into the next emitted row so every sweep
    number is self-validating (VERDICT r3 weak #6: rows needed same-day
    standalone re-runs because nothing recorded the window's health)."""
    global _LAST_PROBE_MS
    import jax
    import jax.numpy as jnp
    import numpy as np
    xs = []
    for _ in range(3):
        _PROBE_SEQ[0] += 1
        x = jnp.asarray(np.full((64,), float(_PROBE_SEQ[0]), np.float32))
        t0 = time.perf_counter()
        jax.device_get(x)
        xs.append((time.perf_counter() - t0) * 1e3)
    _LAST_PROBE_MS = sorted(xs)[1]
    return _LAST_PROBE_MS


_LAST_WINDOW: dict | None = None


def _wait_healthy(max_wait: float = 240.0):
    """Idle until the tunnel probe is fast (bench.py's discipline);
    returns (probe_ms, seconds_waited)."""
    waited = 0.0
    while True:
        p = _probe_ms()
        if p < 250.0 or waited >= max_wait:
            return p, waited
        time.sleep(60)
        waited += 60


def _gated_window(run_once, retries: int = 1, spread_tol: float = 1.25):
    """bench.py's probe -> idle-until-healthy -> measure -> post-probe ->
    retry discipline, for sweep rows (VERDICT r4 weak #1: r4 recorded
    tunnel-degraded streaming rows with no gate). ``run_once()`` returns
    one pass's FPS (float) or a list of per-pass FPS. A window is
    degraded when the post-probe is slow or the pass spread exceeds
    ``spread_tol``; a degraded window idles 60 s and retries once, and
    the chosen window's verdict rides into the next ``_emit`` row via
    ``_LAST_WINDOW`` — a silently-low row can no longer masquerade as a
    healthy measurement. Returns (sorted runs, window record)."""
    global _LAST_WINDOW
    attempts = []
    for a in range(retries + 1):
        p_before, waited = _wait_healthy()
        runs = run_once()
        if isinstance(runs, (int, float)):
            runs = [float(runs)]
        runs = sorted(runs)
        p_after = _probe_ms()
        degraded = (p_after >= 250.0
                    or (len(runs) > 1
                        and runs[-1] > spread_tol * max(runs[0], 1e-9)))
        rec = {"probe_before_ms": round(p_before, 1),
               "probe_after_ms": round(p_after, 1),
               "waited_s": waited, "attempt": a,
               "degraded": degraded}
        attempts.append((runs, rec))
        if not degraded:
            break
        time.sleep(60)  # let the tunnel recover before the retry
    clean = [x for x in attempts if not x[1]["degraded"]]
    runs, rec = max(clean or attempts,
                    key=lambda x: x[0][len(x[0]) // 2])
    rec = dict(rec, attempts=len(attempts))
    _LAST_WINDOW = rec
    return runs, rec


def _emit(name, fps, unit="fps", **extra):
    global _LAST_WINDOW
    row = {"config": name, "value": round(fps, 1), "unit": unit, **extra}
    if _LAST_WINDOW is not None and "probe_verdict" not in row:
        w = _LAST_WINDOW
        row["probe_verdict"] = ("degraded_window" if w["degraded"]
                                else "healthy")
        row["probe_before_ms"] = w["probe_before_ms"]
        row["probe_after_ms"] = w["probe_after_ms"]
        if w["waited_s"]:
            row["waited_s"] = w["waited_s"]
        if w["attempts"] > 1:
            row["window_attempts"] = w["attempts"]
        _LAST_WINDOW = None
    elif _LAST_PROBE_MS is not None and "tunnel_probe_ms" not in row:
        row["tunnel_probe_ms"] = round(_LAST_PROBE_MS, 1)
    line = json.dumps(row)
    print(line)
    if _OUT_PATH is not None:
        with open(_OUT_PATH, "a") as f:
            f.write(line + "\n")


def config1_detect_cpu():
    """Single-frame YOLOv8n detect on the CPU backend.

    The env var alone is NOT enough — the axon TPU plugin overrides
    JAX_PLATFORMS, so the backend must be forced via jax.config after
    import (same fix as cli.py --device cpu / conftest.py). Under --all
    this config runs in a subprocess so the parent keeps its TPU backend.
    """
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from aicamera_tpu.detector import YOLODetector
    det = YOLODetector()
    frame = _load_clip(1)[0]
    det.warm_up(frame.shape[:2], iters=1)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        det.detect(frame)
    dt = (time.perf_counter() - t0) / iters
    _emit("1_yolov8n_single_frame_cpu", 1.0 / dt)


def _staged_chunks(arr, chunk):
    import jax.numpy as jnp
    chunks = []
    for i in range(0, (len(arr) // chunk) * chunk, chunk):
        c = jnp.asarray(arr[i:i + chunk])
        c.block_until_ready()
        chunks.append(c)
    return chunks


def _one_pass(pipe, step, chunks, fv, collect="track"):
    """One timed pass of the chunked fused step over pre-staged chunks.
    Returns wall FPS. Shared by every single-stream config so methodology
    changes (warm-up, readback, reset semantics) stay comparable."""
    import jax
    n = len(chunks) * int(fv.shape[0])
    pipe.reset()
    state = pipe.state
    outs = []
    t0 = time.perf_counter()
    for c in chunks:
        state, det_outs, track_outs = step(
            pipe.yolo_params, pipe.reid_params, state, c, fv)
        outs.append(det_outs if collect == "det" else track_outs)
    jax.device_get(outs)
    return n / (time.perf_counter() - t0)


def _timed_run(pipe, arr, k=96, reps=3, collect="track"):
    """Warm up + compile, pre-stage ``arr`` in HBM, run ``reps`` timed
    passes inside a probe-gated window (idle-until-healthy before, post-
    probe + spread check after, one retry on a degraded window — the
    verdict rides into the emitted row). Returns (sorted run FPS list,
    frames per pass)."""
    import jax.numpy as jnp
    pipe.warm_up(arr.shape[1:3])
    step = pipe._get_step(arr.shape[1:3], k)
    fv = jnp.ones((k,), bool)
    chunks = _staged_chunks(arr, k)
    runs, _ = _gated_window(
        lambda: [_one_pass(pipe, step, chunks, fv, collect)
                 for _ in range(reps)])
    return runs, len(chunks) * k


def _trained_world_frames(frames_n, seed=4):
    """The shared realistic-load scene (configs 9/16/18/19 must score the
    IDENTICAL sequence for their MOTA rows to be comparable). Returns
    (frames (N,H,W,3) u8, [(gt_boxes, gt_ids)], [(gt_boxes, gt_cls)])."""
    import numpy as np
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec
    world = TemporalWorld(WorldSpec(max_objects=10, presence=1.0),
                          seed=seed, speed=3.0)
    frames, gt, gt_det = [], [], []
    for _ in range(frames_n):
        f, b, ids, cls, v = world.step()
        frames.append(f)
        gt.append((b[v], ids[v]))
        gt_det.append((b[v], cls[v]))
    return np.stack(frames), gt, gt_det


def _synthetic_checkpoints(config_name):
    """(yolo_weights_path, reid_weights_path_or_None); emits the missing-
    checkpoint note line and returns None when the detector is absent."""
    root = Path(__file__).resolve().parent.parent
    weights = root / "models" / "detection" / "yolov8n_synthetic.msgpack"
    reid = root / "models" / "reid" / "deepsort_reid_synthetic.msgpack"
    if not weights.exists():
        print(json.dumps({"config": config_name, "value": None,
                          "note": "checkpoint missing — run "
                                  "scripts/train_synthetic.py"}))
        return None
    return str(weights), (str(reid) if reid.exists() else None)


def _replay_quality(pipe, arr, gt, frames=96, score_from=5,
                    collect_dets=False):
    """Replay ``frames`` frames through the host-facing process_frames path
    and score CLEAR-MOT + HOTA vs ground truth over [score_from:frames]
    (the first frames are the trackers' n_init/min_hits warm-up).
    Returns (MOTResult, HOTAResult[, per-frame detections for AP])."""
    import numpy as np
    from aicamera_tpu.eval import evaluate_hota, evaluate_mot
    pipe.reset()
    hyp, preds = [], []
    for res in pipe.process_frames(iter(list(arr[:frames]))):
        if res.tracks:
            hyp.append((np.asarray([t[:4] for t in res.tracks], np.float32),
                        np.asarray([t[4] for t in res.tracks], np.int64)))
        else:
            hyp.append((np.zeros((0, 4), np.float32),
                        np.zeros((0,), np.int64)))
        preds.append((res.det_boxes, res.det_scores, res.det_labels))
    mot = evaluate_mot(gt[score_from:frames], hyp[score_from:frames])
    hota = evaluate_hota(gt[score_from:frames], hyp[score_from:frames])
    return (mot, hota, preds) if collect_dets else (mot, hota)


def config2_detect_clip(frames_n=500):
    """Detection-only loop (decode+NMS included) over the clip."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(chunk_size=96, with_reid=False)
    runs, n = _timed_run(pipe, _load_clip(frames_n), collect="det")
    _emit("2_yolov8n_detect_clip", runs[-1], frames=n)


def config3_full_tracking(frames_n=500):
    """Full detect+track on the clip — defers to bench.py's methodology."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(chunk_size=96)
    runs, n = _timed_run(pipe, _load_clip(frames_n))
    med = runs[1]
    _emit("3_full_tracking_clip", med, frames=n, method="median_of_3",
          vs_baseline=round(med / 30, 2))


def config4_multistream(steps=48, chunk=12):
    """8 x 720p streams, K frames per stream per dispatch (chunked mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aicamera_tpu.parallel import MultiStreamPipeline
    s = 8
    hw = (720, 1280)
    pipe = MultiStreamPipeline(n_streams=s, frame_hw=hw)
    arr = _load_clip(steps, hw=hw)
    staged = []
    for t in range(0, steps, chunk):
        # (S, K, H, W, 3): every stream plays the clip
        c = jnp.asarray(np.stack([arr[t:t + chunk]] * s))
        c.block_until_ready()
        staged.append(c)
    outs = pipe.step_chunk(np.zeros((s, chunk, *hw, 3), np.uint8))  # compile
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for c in staged:
        pipe.states, outs = pipe._chunk_step(
            pipe.yolo_params, pipe.reid_params, pipe.states, c)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    _emit("4_multistream_8x720p", steps * s / dt, unit="stream_fps",
          streams=s, chunk=chunk)


def config5_yolov8m_1080p(frames_n=128, mesh_spec: str | None = None):
    """YOLOv8m at 1080p with crowd-scale track capacity.

    With ``--mesh SxM`` (e.g. 2x4), runs the multi-stream pipeline over a
    ('stream','model') 2-D mesh instead: S parallel 1080p streams with the
    detector's conv channels sharded M-way (tensor parallelism for the
    larger variants)."""
    import jax
    import jax.numpy as jnp
    from aicamera_tpu.core.state import TrackerParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu import config as cfg
    if mesh_spec:
        import numpy as np
        from aicamera_tpu.parallel import MultiStreamPipeline, make_mesh
        s, m = (int(v) for v in mesh_spec.lower().split("x"))
        hw = (1080, 1920)
        tp = TrackerParams(max_tracks=256, max_detections=100,
                           feature_dim=cfg.REID_FEATURE_DIM)
        pipe = MultiStreamPipeline(n_streams=s, frame_hw=hw, variant="m",
                                   mesh=make_mesh(s, m), tracker_params=tp)
        arr = _load_clip(frames_n, hw=hw)
        k = 4
        staged = []
        for t in range(0, (frames_n // k) * k, k):
            c = jnp.asarray(np.stack([arr[t:t + k]] * s))
            c.block_until_ready()
            staged.append(c)
        outs = pipe.step_chunk(np.zeros((s, k, *hw, 3), np.uint8))
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        for c in staged:
            pipe.states, outs = pipe._chunk_step(
                pipe.yolo_params, pipe.reid_params, pipe.states, c)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        _emit("5_yolov8m_1080p_crowd", len(staged) * k * s / dt,
              unit="stream_fps", mesh=mesh_spec)
        return
    tp = TrackerParams(max_tracks=256, max_detections=100,
                       feature_dim=cfg.REID_FEATURE_DIM)
    pipe = TrackingPipeline(variant="m", chunk_size=16, tracker_params=tp)
    runs, n = _timed_run(pipe, _load_clip(frames_n, hw=(1080, 1920)),
                         k=16, reps=2)
    _emit("5_yolov8m_1080p_crowd", runs[-1], frames=n)


def config6_streaming_e2e(chunk=32):
    """Streaming end-to-end: wall-clock FPS INCLUDING host video decode and
    frame upload, over the CLI's double-buffered path (decode-ahead reader,
    results consumed one chunk behind dispatch). This is the number the
    north star's 'OpenCV frame I/O overlapped with device dispatch' claim
    stands on; configs 2/3 exclude decode like the reference's accounting.

    Caveat: on the tunneled dev runtime, sustained host->device transfers
    degrade (~1s/transfer once the queue is busy; see CLAUDE.md) — real
    v5e PCIe hosts do not behave this way, so this number is a lower bound.
    """
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu.utils.video_io import VideoReader

    pipe = TrackingPipeline(chunk_size=chunk)
    reader0 = VideoReader(str(CLIP), max_frames=chunk)
    first = next(iter(reader0.frames()))
    reader0.release()
    pipe.warm_up(first.shape[:2])

    counted = [0]

    def _py_stream_pass():
        reader = VideoReader(str(CLIP))
        pipe.reset()
        n = 0
        t0 = time.perf_counter()
        for result in pipe.process_frames(reader.frames()):
            _ = result.tracks  # touch the host result
            n += 1
        dt = time.perf_counter() - t0
        reader.release()
        counted[0] = n
        return n / dt

    # r4 recorded 21.3 FPS here with a note blaming the tunnel while
    # r3's healthy window saw 32.3 — every streaming row now runs inside
    # a probe-gated window (VERDICT r4 weak #1) so a degraded tunnel
    # produces a retry or an explicit degraded verdict, never a
    # silently-low row.
    runs, _ = _gated_window(_py_stream_pass)
    _emit("6_streaming_e2e_incl_decode", runs[-1], frames=counted[0],
          chunk=chunk,
          note="includes decode+upload; tunnel lower bound on this host")

    # (b) the same workload over the native C++ decoder drained in whole
    # chunks (one Python crossing per dispatch, utils/video_io.py:78-142,
    # pipeline.process_chunks) — the CLI's --native_io headless path
    from aicamera_tpu.native import video_available
    if video_available():
        from aicamera_tpu.utils.video_io import NativeVideoReader

        def _native_stream_pass():
            nreader = NativeVideoReader(str(CLIP))
            pipe.reset()
            n = 0
            t0 = time.perf_counter()
            for result in pipe.process_chunks(nreader.chunks(chunk)):
                _ = result.tracks
                n += 1
            dt = time.perf_counter() - t0
            nreader.release()
            counted[0] = n
            return n / dt

        runs, _ = _gated_window(_native_stream_pass)
        _emit("6b_streaming_native_io", runs[-1], frames=counted[0],
              chunk=chunk,
              note="native C++ decode thread, chunk-granular drains")

        # (d) same native path at the throughput chunk (96 — what configs
        # 2/3 dispatch): fewer, larger host->device transfers. On the
        # tunneled runtime the per-RPC cost dominates streaming, so chunk
        # size is the one free lever; latency rises to ~chunk/fps.
        pipe96 = TrackingPipeline(chunk_size=96)
        nreader0 = NativeVideoReader(str(CLIP), max_frames=1)
        pipe96.warm_up((nreader0.height, nreader0.width))
        nreader0.release()

        def _native96_pass():
            nreader = NativeVideoReader(str(CLIP))
            pipe96.reset()
            n = 0
            t0 = time.perf_counter()
            for result in pipe96.process_chunks(nreader.chunks(96)):
                _ = result.tracks
                n += 1
            dt = time.perf_counter() - t0
            nreader.release()
            counted[0] = n
            return n / dt

        runs, _ = _gated_window(_native96_pass)
        _emit("6d_streaming_native_chunk96", runs[-1], frames=counted[0],
              chunk=96,
              note="native decode + chunk-96 dispatch (throughput mode; "
                   "adds ~chunk/fps of latency)")

    # (c) per-stage decomposition of the streaming path: decode-only,
    # upload-only, compute-only (pre-staged frames through the same fused
    # step), so the gap between 6/6b and config 3 is attributable.
    import numpy as np

    t0 = time.perf_counter()
    arr = _load_clip(None)
    t_decode = time.perf_counter() - t0  # cv2 sequential decode, all frames
    nf = arr.shape[0]

    if video_available():
        from aicamera_tpu.utils.video_io import NativeVideoReader

        # host-CPU stage: contention (not the tunnel) is the noise
        # source — r4's sweep recorded 130.6 FPS here vs 273 standalone
        # the same day. Best-of-3 with the spread recorded: decode work
        # is deterministic, so slower passes only measure interference.
        def _decode_pass():
            nreader = NativeVideoReader(str(CLIP))
            t0 = time.perf_counter()
            while True:
                c = nreader.read_chunk(chunk)
                if len(c) == 0:
                    break
            dt = time.perf_counter() - t0
            nreader.release()
            return nf / dt

        decode_runs = sorted(_decode_pass() for _ in range(3))
        t_decode_native = nf / decode_runs[-1]
    else:
        decode_runs = []
        t_decode_native = float("nan")

    import jax as _jax
    _wait_healthy()  # upload is the tunnel-sensitive stage
    t0 = time.perf_counter()
    bufs = [_jax.device_put(arr[i:i + chunk])
            for i in range(0, nf - chunk + 1, chunk)]
    _jax.block_until_ready(bufs)  # all transfers, not just the last enqueue
    t_upload = time.perf_counter() - t0
    n_up = len(bufs) * chunk  # whole chunks only (nf may not divide)
    upload_fps = round(n_up / t_upload, 1) if bufs else float("nan")
    del bufs

    pipe.reset()
    runs, _n3 = _timed_run(pipe, arr, k=chunk, reps=1)
    compute_fps = runs[0]

    _emit("6c_streaming_decomposition", round(nf / t_decode, 1),
          unit="decode_fps",
          decode_native_fps=round(nf / t_decode_native, 1),
          decode_native_spread=[round(r, 1) for r in decode_runs],
          upload_fps=upload_fps,
          compute_fps=round(compute_fps, 1),
          frames=nf, chunk=chunk,
          note="e2e is min of stages when fully overlapped; on this "
               "tunneled runtime upload degrades under sustained load "
               "(CLAUDE.md) — a PCIe v5e host uploads 540p u8 at "
               ">10 GB/s = >6000 fps, so e2e there = min(decode, compute)")


def config7_worst_case_load(frames_n=288):
    """Full tracking with a saturated 64-detection slate every frame
    (synthetic grid injected post-NMS): largest ReID bucket, full cascade,
    full track table. The honest lower bound for crowded scenes.
    Chunk 96 matches bench.py's worst-case methodology (same program)."""
    from aicamera_tpu import config as cfg
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(chunk_size=96,
                            synthetic_load=cfg.MAX_DETECTIONS)
    runs, n = _timed_run(pipe, _load_clip(frames_n))
    _emit("7_worst_case_64det", runs[1], frames=n, method="median_of_3")


def config8_latency(frames_n=200):
    """Single-frame latency (webcam/serving mode): chunk-1 dispatch with a
    synchronous readback per frame. Reports p50/p99 wall latency AND the
    device-compute latency (the system's true floor, separated from the
    tunnel's RPC round trip).

    Compute methodology (axon-safe, scripts/axon_timing.py): distinct
    pre-staged frame buffers, the chunk-1 program chained through its
    donated tracker state, outputs folded to a scalar per dispatch, ONE
    device_get per group of 20 — so the RTT amortizes to 1/20th while
    every dispatch's device time is still on the critical path. Group
    percentiles are over per-group means.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    arr = _load_clip(frames_n)
    pipe = TrackingPipeline(chunk_size=1)
    pipe.warm_up(arr.shape[1:3], chunk_size=1, iters=3)
    lat = []
    for f in arr:
        t0 = time.perf_counter()
        pipe.process_frame(f)
        lat.append(time.perf_counter() - t0)
    lat_ms = sorted(v * 1e3 for v in lat)
    p50 = lat_ms[len(lat_ms) // 2]
    p99 = lat_ms[int(len(lat_ms) * 0.99)]

    # --- compute-only (device-time) latency -------------------------------
    @jax.jit
    def _fold(det_outs, track_outs):
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree.leaves((det_outs, track_outs)))

    staged = [jnp.asarray(f[None]) for f in arr]
    jax.block_until_ready(staged)
    step = pipe._get_step(arr.shape[1:3], 1)
    fv = jnp.ones((1,), bool)
    pipe.reset()
    state = pipe.state
    g = 20
    # warm the chained path once (2 dispatches + fetch)
    for i in range(2):
        state, d_o, t_o = step(pipe.yolo_params, pipe.reid_params, state,
                               staged[i], fv)
    jax.device_get(_fold(d_o, t_o))
    group_ms = []
    idx = 2
    while idx + g <= len(staged):
        t0 = time.perf_counter()
        scalars = []
        for j in range(idx, idx + g):
            state, d_o, t_o = step(pipe.yolo_params, pipe.reid_params,
                                   state, staged[j], fv)
            scalars.append(_fold(d_o, t_o))
        jax.device_get(scalars)
        group_ms.append((time.perf_counter() - t0) / g * 1e3)
        idx += g
    group_ms.sort()
    c_p50 = group_ms[len(group_ms) // 2]
    c_p99 = group_ms[min(int(len(group_ms) * 0.99), len(group_ms) - 1)]

    _emit("8_single_frame_latency_p50", p50, unit="ms",
          p99_ms=round(p99, 2), frames=len(lat_ms),
          compute_p50_ms=round(c_p50, 2), compute_p99_ms=round(c_p99, 2),
          compute_groups=len(group_ms), group=g,
          note="wall rows include the tunnel RPC round trip per frame; "
               "compute_* rows are device time (group-of-20 amortized "
               "fetch) — the PCIe-host latency floor")


def config9_synthetic_trained(frames_n=288):
    """Full tracking on synthetic 540p scenes with the self-trained
    detector (scripts/train_synthetic.py): a REALISTIC detection load —
    ~8 live objects per frame producing genuine boxes, ReID crops,
    cascade and lifecycle work — unlike configs 2/3, whose untrained
    weights make the post-NMS slate noise-driven. Also sanity-checks
    tracking quality (MOTA vs exact synthetic ground truth)."""
    from aicamera_tpu.eval import evaluate_detections
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    ckpt = _synthetic_checkpoints("9_synthetic_trained")
    if ckpt is None:
        return
    arr, gt, gt_det = _trained_world_frames(frames_n)
    pipe = TrackingPipeline(chunk_size=96, yolo_weights=ckpt[0],
                            reid_weights=ckpt[1])
    runs, n = _timed_run(pipe, arr)

    # tracking + detection quality sanity on the same sequence
    mot, hota, preds = _replay_quality(pipe, arr, gt, collect_dets=True)
    ap = evaluate_detections(gt_det[:96], preds)
    # AP here scores the pipeline's emitted detections, which carry its
    # confidence threshold — a lower bound on full-PR-curve COCO AP
    # (scripts/train_synthetic.py reports that one, floor 0.25)
    _emit("9_synthetic_trained_tracking", runs[1], frames=n,
          method="median_of_3", mota=round(mot.mota, 3),
          motp=round(mot.motp, 3), id_switches=mot.id_switches,
          hota=round(hota.hota, 3), ass_a=round(hota.ass_a, 3),
          ap50=round(ap.ap50, 3), map_5095=round(ap.map_5095, 3),
          ap_at_conf=pipe.conf_threshold)


def config10_multistream_trained(steps=192, chunk=12):
    # chunk 12 x 8 streams = the same 96-frame flat detection batch as the
    # single-stream configs; larger chunks OOM HBM at 540p x 8 streams.
    """8 x 540p streams under REALISTIC load (self-trained detector +
    embedder, ~9 live tracks per stream): aggregate tracked FPS on one
    chip. The vmapped scan pays its control-region overhead once per time
    step for all S streams — but vmap also converts every lax.cond into
    executing BOTH branches and runs while_loops to the all-stream union,
    so the cond-skip fast paths of the single-stream scan are forfeited.
    Measured net: aggregate ~734 FPS vs 1062 single-stream (the two effects
    roughly cancel; 8 independent cameras still track at >90 FPS each on
    one chip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aicamera_tpu.parallel import MultiStreamPipeline
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

    ckpt = _synthetic_checkpoints("10_multistream_trained")
    if ckpt is None:
        return
    s = 8
    spec = WorldSpec(max_objects=10, presence=1.0)
    worlds = [TemporalWorld(spec, seed=100 + i, speed=3.0)
              for i in range(s)]
    hw = spec.hw
    pipe = MultiStreamPipeline(
        n_streams=s, frame_hw=hw, yolo_weights=ckpt[0],
        reid_weights=ckpt[1])
    staged = []
    for t in range(0, steps, chunk):
        block = np.stack([
            np.stack([w.step()[0] for _ in range(chunk)]) for w in worlds])
        c = jnp.asarray(block)             # (S, K, H, W, 3)
        c.block_until_ready()
        staged.append(c)
    outs = pipe.step_chunk(np.zeros((s, chunk, *hw, 3), np.uint8))
    jax.block_until_ready(outs)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for c in staged:
            pipe.states, outs = pipe._chunk_step(
                pipe.yolo_params, pipe.reid_params, pipe.states, c)
        jax.block_until_ready(outs)
        runs.append(steps * s / (time.perf_counter() - t0))
    _emit("10_multistream_trained_8x540p", sorted(runs)[1],
          unit="stream_fps", streams=s, chunk=chunk, method="median_of_3")


def config11_raw_detector(iters=48):
    """Raw YOLOv8n forward throughput at 640x640 — the mirror of the
    reference's 'raw TRT engine speed' row (~400+ FPS at 1x3x640x640 fp16,
    reference README.md:156): model execution only, no preprocess, decode
    or NMS. Reported at the reference's batch 1 and at the batch-96 chunk
    the fused pipeline actually dispatches (TPU-native batching is where
    the MXU throughput lives).

    Methodology (docs/ROOFLINE.md): each dispatch gets a DISTINCT
    on-device-generated input (the tunneled runtime short-circuits repeat
    dispatches of one (executable, buffer) pair — an earlier version of
    this config reused one buffer and recorded physically impossible
    throughput) and a fold-to-scalar result dependency, fetched once
    (scripts/axon_timing.py). Input generation + output fold add ~3%
    constant overhead to the reported number."""
    import jax
    import jax.numpy as jnp
    from scripts.axon_timing import measure
    from aicamera_tpu.runtime.params import resolve_yolo_params
    model, params = resolve_yolo_params("n")
    fps = {}
    for batch in (1, 96):
        @jax.jit
        def gen_fwd(p, seed, _b=batch):
            x = jax.random.uniform(jax.random.PRNGKey(seed),
                                   (_b, 640, 640, 3), jnp.bfloat16)
            return model.apply(p, x)

        runs = []
        for r in range(3):
            inputs = [(params, jnp.int32(1000 * r + i))
                      for i in range(iters)]
            runs.append(batch / measure(gen_fwd, inputs, warmup=2))
        fps[batch] = sorted(runs)[1]
    _emit("11_raw_yolov8n_fwd_640", fps[96], batch=96,
          batch1_fps=round(fps[1], 1), method="median_of_3",
          note="model exec only, distinct inputs per dispatch; reference "
               "raw engine ~400+ FPS")


def config12_raw_reid(iters=48):
    """Raw ReID embedder throughput — the mirror of the reference's raw
    deepsort_reid engine row (~600+ crops/s at batch<=8 fp16, reference
    README.md:157): forward only, preprocessed 128x64 crops in. Reported
    at the reference engine's max batch (8, export_trt_engines.sh:32-34)
    and at the pipeline's largest crop bucket (64). Same
    distinct-inputs + fold-to-scalar methodology as config 11."""
    import jax
    import jax.numpy as jnp
    from scripts.axon_timing import measure
    from aicamera_tpu.runtime.params import resolve_reid_params
    model, params = resolve_reid_params()
    cps = {}
    for batch in (8, 64):
        @jax.jit
        def gen_fwd(p, seed, _b=batch):
            x = jax.random.uniform(jax.random.PRNGKey(seed),
                                   (_b, 128, 64, 3), jnp.float32)
            return model.apply(p, x)

        runs = []
        for r in range(3):
            inputs = [(params, jnp.int32(1000 * r + i))
                      for i in range(iters)]
            runs.append(batch / measure(gen_fwd, inputs, warmup=2))
        cps[batch] = sorted(runs)[1]
    _emit("12_raw_reid_embed", cps[64], unit="crops_per_s", batch=64,
          batch8_cps=round(cps[8], 1), method="median_of_3",
          note="model exec only, distinct inputs per dispatch; reference "
               "raw engine ~600+ crops/s")


def config13_yolov8x_4k(frames_n=48):
    """YOLOv8x (largest variant) at 4K source, 1280x1280 input: the
    extreme single-chip scale point. The reference tops out at yolov8n
    fixed to 1x3x640x640 (export_trt_engines.sh:26-28); this runs ~19x
    its FLOPs per frame (68M-param x at 4x the pixels) with full
    tracking and crowd-scale capacity, still on one chip."""
    from aicamera_tpu.core.state import TrackerParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu import config as cfg

    # chunk 4: 4K uint8 frames + x@1280 activations bound the chunk
    tp = TrackerParams(max_tracks=256, max_detections=100,
                       feature_dim=cfg.REID_FEATURE_DIM)
    pipe = TrackingPipeline(variant="x", chunk_size=4,
                            input_shape=(1280, 1280), tracker_params=tp)
    runs, n = _timed_run(pipe, _load_clip(frames_n, hw=(2160, 3840)), k=4)
    _emit("13_yolov8x_4k", runs[1], frames=n,
          method="median_of_3", input_shape="1280x1280",
          note="largest variant at 4K source; reference: n/a")


def config14_auto_input(frames_n=500):
    """Letterbox `auto` (minimum-rectangle) inference canvas vs the square
    default, paired A/B in one process (absolute tunnel numbers drift;
    paired comparisons are the trustworthy signal — docs/ROOFLINE.md).

    The reference utility supports auto mode (image_processing.py:24-44)
    but its pipeline always convolves the full 640x640 engine canvas; a
    16:9 source spends 40% of those rows on constant-114 padding.
    `letterbox_auto=True` runs the detector on the 384x640 minimum
    rectangle instead. Interleaved runs, median of 3 each."""
    import jax
    import jax.numpy as jnp
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    arr = _load_clip(frames_n)
    k = 96
    fv = jnp.ones((k,), bool)
    chunks = _staged_chunks(arr, k)
    n = len(chunks) * k

    def build(auto):
        pipe = TrackingPipeline(chunk_size=k, letterbox_auto=auto)
        pipe.warm_up(arr.shape[1:3])
        return pipe, pipe._get_step(arr.shape[1:3], k)

    pipes = {False: build(False), True: build(True)}
    runs = {False: [], True: []}
    for _ in range(3):
        for auto in (False, True):  # interleaved A/B
            pipe, step = pipes[auto]
            pipe.reset()
            state = pipe.state
            outs = []
            t0 = time.perf_counter()
            for c in chunks:
                state, _, track_outs = step(
                    pipe.yolo_params, pipe.reid_params, state, c, fv)
                outs.append(track_outs)
            jax.device_get(outs)
            runs[auto].append(n / (time.perf_counter() - t0))
    sq, au = sorted(runs[False])[1], sorted(runs[True])[1]
    _emit("14_auto_input_canvas", au, frames=n, method="median_of_3",
          square_fps=round(sq, 1), speedup=round(au / sq, 3),
          canvas="384x640 vs 640x640",
          note="opt-in --auto_input; reference parity mode is square")


def config15_bytetrack_clip(frames_n=500):
    """Full ByteTrack tracking on the clip — the alternative tracker core
    (reference README.md 'Future Enhancements': ByteTrack integration).
    Same clip/chunk/median methodology as config 3, but the fused step has
    NO ReID crop/embed stage (motion-only association) and surfaces
    low-score boxes to the tracker (NMS floor at 0.1)."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(chunk_size=96, tracker="bytetrack")
    runs, n = _timed_run(pipe, _load_clip(frames_n))
    _emit("15_bytetrack_clip", runs[1], frames=n,
          method="median_of_3", note="motion-only tracker, no ReID stage")


def config16_bytetrack_trained(frames_n=288):
    """ByteTrack under the REALISTIC trained-detector load (the config-9
    scenario), with MOTA quality vs exact synthetic ground truth — a
    direct quality+speed comparison against the DeepSORT core on the
    identical workload."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    ckpt = _synthetic_checkpoints("16_bytetrack_trained")
    if ckpt is None:
        return
    arr, gt, _ = _trained_world_frames(frames_n)
    pipe = TrackingPipeline(chunk_size=96, tracker="bytetrack",
                            yolo_weights=ckpt[0])
    runs, n = _timed_run(pipe, arr)
    mot, hota = _replay_quality(pipe, arr, gt)
    _emit("16_bytetrack_trained", runs[1], frames=n,
          method="median_of_3", mota=round(mot.mota, 3),
          motp=round(mot.motp, 3), id_switches=mot.id_switches,
          hota=round(hota.hota, 3),
          note="same workload as config 9; motion-only tracker")


def config17_ocsort_clip(frames_n=500):
    """Full OC-SORT tracking on the clip — the second tracker on the
    reference README's 'Future Enhancements' list. Same clip/chunk/median
    methodology as configs 3/15; the fused step has NO ReID crop/embed
    stage and applies OC-SORT's strict score > 0.6 input gate."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(chunk_size=96, tracker="ocsort")
    runs, n = _timed_run(pipe, _load_clip(frames_n))
    _emit("17_ocsort_clip", runs[1], frames=n,
          method="median_of_3",
          note="observation-centric motion tracker, no ReID stage")


def config18_ocsort_trained(frames_n=288):
    """OC-SORT under the REALISTIC trained-detector load (the config-9
    scenario), MOTA-checked vs exact synthetic ground truth — the
    three-way quality+speed comparison point against DeepSORT (config 9)
    and ByteTrack (config 16) on the identical workload. Official
    det_thresh=0.6 input gate (stricter than the others' floors)."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    ckpt = _synthetic_checkpoints("18_ocsort_trained")
    if ckpt is None:
        return
    arr, gt, _ = _trained_world_frames(frames_n)
    pipe = TrackingPipeline(chunk_size=96, tracker="ocsort",
                            yolo_weights=ckpt[0])
    runs, n = _timed_run(pipe, arr)
    mot, hota = _replay_quality(pipe, arr, gt)
    _emit("18_ocsort_trained", runs[1], frames=n,
          method="median_of_3", mota=round(mot.mota, 3),
          motp=round(mot.motp, 3), id_switches=mot.id_switches,
          hota=round(hota.hota, 3),
          note="same workload as configs 9/16; det_thresh=0.6 gate")


def config19_ema_gallery_trained(frames_n=288):
    """DeepSORT with the EMA appearance bank (gallery_strategy='ema') on
    the config-9 REALISTIC workload — quantifies both sides of the
    StrongSORT-style gallery: speed (the (T,G,N,D) min-over-gallery
    einsum collapses to G=1 and the ring scatter disappears from the
    scan) and quality (MOTA/IDSW vs the same exact ground truth as
    configs 9/16/18; FIFO ring is the reference-parity baseline)."""
    from aicamera_tpu import config as cfg
    from aicamera_tpu.core.state import TrackerParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    ckpt = _synthetic_checkpoints("19_ema_gallery_trained")
    if ckpt is None:
        return
    arr, gt, _ = _trained_world_frames(frames_n)

    params = TrackerParams(
        max_cosine_distance=cfg.DEEPSORT_MAX_DIST,
        nn_budget=1,  # the EMA bank occupies one gallery slot
        max_iou_distance=cfg.DEEPSORT_MAX_IOU_DISTANCE,
        max_age=cfg.DEEPSORT_MAX_AGE, n_init=cfg.DEEPSORT_N_INIT,
        max_tracks=cfg.MAX_TRACKS, max_detections=cfg.MAX_DETECTIONS,
        feature_dim=cfg.REID_FEATURE_DIM, ema_alpha=0.9)
    pipe = TrackingPipeline(
        chunk_size=96, yolo_weights=ckpt[0], reid_weights=ckpt[1],
        tracker_params=params)
    runs, n = _timed_run(pipe, arr)
    mot, hota = _replay_quality(pipe, arr, gt)
    _emit("19_ema_gallery_trained", runs[1], frames=n,
          method="median_of_3", mota=round(mot.mota, 3),
          motp=round(mot.motp, 3), id_switches=mot.id_switches,
          hota=round(hota.hota, 3),
          note="config 9 workload with gallery_strategy=ema alpha=0.9")


def config20_gmc_pan(frames_n=288):
    """Camera-motion compensation (ops/gmc.py) on the config-9 realistic
    workload filmed by an OSCILLATING camera (sinusoidal pan, ±30 px
    amplitude, 8-frame period — a motion constant-velocity Kalman filters
    cannot learn; the reference has no answer to it at all). Frames are
    rolled by the pan and the ground truth shifted with them; paired A/B
    (gmc off vs affine) on the identical panned sequence reports both the
    estimation overhead (same-workload FPS delta) and the quality rescue
    (MOTA / ID switches)."""
    import numpy as np
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    ckpt = _synthetic_checkpoints("20_gmc_pan")
    if ckpt is None:
        return
    arr, gt, _ = _trained_world_frames(frames_n)
    w = arr.shape[2]
    pans = np.round(30.0 * np.sin(2 * np.pi * np.arange(frames_n) / 8.0)
                    ).astype(int)
    arr_p = np.stack([np.roll(f, shift=int(p), axis=1)
                      for f, p in zip(arr, pans)])
    gt_p = []
    for (boxes, ids), p in zip(gt, pans):
        b = boxes + np.array([p, 0, p, 0], np.float32)
        keep = (b[:, 0] >= 0) & (b[:, 2] < w)   # rolled-out boxes wrap
        gt_p.append((b[keep], ids[keep]))

    results = {}
    for mode in (False, "affine"):
        pipe = TrackingPipeline(chunk_size=96, yolo_weights=ckpt[0],
                                reid_weights=ckpt[1], gmc=mode)
        runs, n = _timed_run(pipe, arr_p)
        mot, hota = _replay_quality(pipe, arr_p, gt_p)
        results[mode] = (runs[1], mot, hota, n)
    on_fps, on_mot, on_hota, n = results["affine"]
    off_fps, off_mot, off_hota, _ = results[False]
    _emit("20_gmc_pan", on_fps, frames=n, method="median_of_3",
          off_fps=round(off_fps, 1),
          overhead_pct=round(100 * (1 - on_fps / off_fps), 1),
          mota=round(on_mot.mota, 3), id_switches=on_mot.id_switches,
          hota=round(on_hota.hota, 3),
          off_mota=round(off_mot.mota, 3),
          off_id_switches=off_mot.id_switches,
          off_hota=round(off_hota.hota, 3),
          note="oscillating-pan camera; reference cannot compensate")


def config22_botsort_trained(frames_n=288):
    """BoT-SORT (ByteTrack + appearance fusion, config 16's core with the
    ReID embed stage) under the REALISTIC trained-detector+embedder load —
    the config-9 scenario; directly comparable with the DeepSORT (9),
    ByteTrack (16) and OC-SORT (18) rows on the same scenes and ground
    truth."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    ckpt = _synthetic_checkpoints("22_botsort_trained")
    if ckpt is None:
        return
    arr, gt, _ = _trained_world_frames(frames_n)
    pipe = TrackingPipeline(chunk_size=96, tracker="botsort",
                            yolo_weights=ckpt[0], reid_weights=ckpt[1])
    runs, n = _timed_run(pipe, arr)
    mot, hota = _replay_quality(pipe, arr, gt)
    _emit("22_botsort_trained", runs[1], frames=n,
          method="median_of_3", mota=round(mot.mota, 3),
          motp=round(mot.motp, 3), id_switches=mot.id_switches,
          hota=round(hota.hota, 3),
          note="same workload as configs 9/16/18; ByteTrack + ReID fusion")


def config21_nsa_trained(frames_n=288):
    """NSA (noise-scale-adaptive) Kalman updates on the config-9
    REALISTIC workload: paired A/B (nsa off vs on) on the identical
    sequence. NSA scales each matched correction's measurement noise by
    (1 - detection confidence) — StrongSORT's eq. 8; the off arm is the
    reference's fixed noise model. Reports both arms' quality so the
    tradeoff (tighter measurement-following vs noise smoothing) is
    visible."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    ckpt = _synthetic_checkpoints("21_nsa_trained")
    if ckpt is None:
        return
    arr, gt, _ = _trained_world_frames(frames_n)
    results = {}
    for nsa in (False, True):
        pipe = TrackingPipeline(chunk_size=96, yolo_weights=ckpt[0],
                                reid_weights=ckpt[1], nsa=nsa)
        runs, n = _timed_run(pipe, arr)
        mot, hota = _replay_quality(pipe, arr, gt)
        results[nsa] = (runs[1], mot, hota, n)
    on_fps, on_mot, on_hota, n = results[True]
    off_fps, off_mot, off_hota, _ = results[False]
    _emit("21_nsa_trained", on_fps, frames=n, method="median_of_3",
          off_fps=round(off_fps, 1),
          mota=round(on_mot.mota, 3), motp=round(on_mot.motp, 3),
          id_switches=on_mot.id_switches, hota=round(on_hota.hota, 3),
          off_mota=round(off_mot.mota, 3), off_motp=round(off_mot.motp, 3),
          off_id_switches=off_mot.id_switches,
          off_hota=round(off_hota.hota, 3),
          note="config 9 workload; paired A/B, off = reference noise model")


def config23_strongsort_trained(frames_n=288):
    """StrongSORT preset (DeepSORT core + EMA bank + NSA Kalman + affine
    GMC) under the REALISTIC trained-detector+embedder load — the
    config-9 scenario; directly comparable with the DeepSORT (9),
    ByteTrack (16), OC-SORT (18) and BoT-SORT (22) rows on the same
    scenes and ground truth. The static synthetic camera makes GMC's
    estimate ~identity, so this row also prices the preset's estimation
    overhead against config 9."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    ckpt = _synthetic_checkpoints("23_strongsort_trained")
    if ckpt is None:
        return
    arr, gt, _ = _trained_world_frames(frames_n)
    pipe = TrackingPipeline(chunk_size=96, tracker="strongsort",
                            yolo_weights=ckpt[0], reid_weights=ckpt[1])
    runs, n = _timed_run(pipe, arr)
    mot, hota = _replay_quality(pipe, arr, gt)
    _emit("23_strongsort_trained", runs[1], frames=n,
          method="median_of_3", mota=round(mot.mota, 3),
          motp=round(mot.motp, 3), id_switches=mot.id_switches,
          hota=round(hota.hota, 3),
          note="same workload as configs 9/16/18/22; EMA+NSA+GMC preset")


def config24_deepocsort_trained(frames_n=288):
    """Deep OC-SORT (OC-SORT core + adaptively weighted appearance,
    `OCSortParams(with_appearance=True)`) under the REALISTIC
    trained-detector+embedder load — the config-9 scenario; directly
    comparable with the DeepSORT (9), ByteTrack (16), OC-SORT (18),
    BoT-SORT (22) and StrongSORT (23) rows on the same scenes and
    ground truth. The delta vs config 18 prices the appearance fusion:
    the ReID crop/embed stage joins the fused step and round-1
    association adds the AW cosine term."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    ckpt = _synthetic_checkpoints("24_deepocsort_trained")
    if ckpt is None:
        return
    arr, gt, _ = _trained_world_frames(frames_n)
    pipe = TrackingPipeline(chunk_size=96, tracker="deepocsort",
                            yolo_weights=ckpt[0], reid_weights=ckpt[1])
    runs, n = _timed_run(pipe, arr)
    mot, hota = _replay_quality(pipe, arr, gt)
    _emit("24_deepocsort_trained", runs[1], frames=n,
          method="median_of_3", mota=round(mot.mota, 3),
          motp=round(mot.motp, 3), id_switches=mot.id_switches,
          hota=round(hota.hota, 3),
          note="same workload as configs 9/16/18/22/23; "
               "OC-SORT + AW appearance; delta vs 18 = appearance cost")


def config25_tiled_4k(frames_n=24):
    """SAHI-style tiled detection at 4K (ops/tiling.py, detect_tiled):
    a 3x3 grid (overlap 0.2) + the full frame = ONE batch-10 640x640
    MXU forward per frame, merged by the on-device global NMS — vs the
    plain full-frame 4K letterbox (which shrinks a person at 4K to a
    ~10px blob). Also reports the quality rescue on a 1080p four-world
    mosaic with the trained checkpoint: the full-frame letterbox sees
    every object at HALF the training scale, the 2x2 tiles at native
    scale (same scenario as tests/test_tiled.py, more frames)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aicamera_tpu.detector import YOLODetector
    from aicamera_tpu.eval import evaluate_detections
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

    det = YOLODetector()
    hw = (2160, 3840)
    rng = np.random.RandomState(0)
    staged = [jnp.asarray((rng.rand(*hw, 3) * 255).astype(np.uint8))
              for _ in range(8)]   # distinct inputs: tunnel-honest timing
    jax.block_until_ready(staged)
    speed = {}
    for name, step in (
            ("tiled", det._get_tiled_step(hw, (3, 3), 0.2, True)),
            ("single", det._get_step(hw))):
        out = step(det.params, staged[0])
        jax.block_until_ready(out)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(frames_n):
                out = step(det.params, staged[i % len(staged)])
            jax.block_until_ready(out)
            runs.append(frames_n / (time.perf_counter() - t0))
        speed[name] = sorted(runs)[1]

    quality = {}
    ckpt = _synthetic_checkpoints("25_tiled_4k")
    if ckpt is not None:
        spec = WorldSpec(max_objects=6, presence=1.0)
        worlds = [TemporalWorld(spec, seed=50 + i, speed=3.0)
                  for i in range(4)]
        h, w = spec.hw
        frames, gt = [], []
        for _ in range(12):
            tiles, boxes, cls = [], [], []
            for q, world in enumerate(worlds):
                f, b, ids, c, v = world.step()
                tiles.append(np.asarray(f))
                oy, ox = (q // 2) * h, (q % 2) * w
                bb = np.asarray(b)[np.asarray(v)]
                boxes.append(bb + np.array([ox, oy, ox, oy], np.float32))
                cls.append(np.asarray(c)[np.asarray(v)])
            frames.append(np.concatenate(
                [np.concatenate(tiles[:2], 1),
                 np.concatenate(tiles[2:], 1)], 0))
            gt.append((np.concatenate(boxes), np.concatenate(cls)))
        tdet = YOLODetector(engine_path=ckpt[0], conf_threshold=0.1)
        single, tiled = [], []
        for f in frames:
            b, s, c, _ = tdet.detect(f)
            single.append((b, s, c))
            b, s, c, _ = tdet.detect_tiled(f, grid=(2, 2), overlap=0.0,
                                           include_full_frame=False)
            tiled.append((b, s, c))
        quality = {
            "mosaic_ap50_tiled": round(
                evaluate_detections(gt, tiled).ap50, 3),
            "mosaic_ap50_full_frame": round(
                evaluate_detections(gt, single).ap50, 3)}
    _emit("25_tiled_4k", speed["tiled"], frames=frames_n,
          method="median_of_3", grid="3x3+full",
          single_pass_fps=round(speed["single"], 1), **quality,
          note="tiled = batch-10 640x640 per 4K frame; quality rows: "
               "1080p mosaic, trained ckpt, 2x2 no-overlap vs full frame")


def config26_serving(duration_s=12.0):
    """Multi-tenant serving under concurrent clients
    (serving.py::MultiTenantTrackingService — one fused device program
    batches all tenants per dispatch; deadline-aware adaptive windowing
    decides when a partial batch fires). Three phases:

    0. DEVICE DISPATCH COST (axon-safe, scripts/axon_timing.py): the
       service's exact masked multistream program measured in device
       time — distinct pre-staged (S, K) frame buffers chained through
       the donated tracker states, outputs folded to scalars, one fetch
       at the end. Yields the MEASURED per-dispatch device cost and the
       serving path's device capacity in req/s (replacing the r3 row's
       inferred PCIe projection).
    1. SATURATION: 4 closed-loop clients (re-submit on resolve, window
       8) measure the service's peak request throughput on this host
       (tunnel-bound here; device capacity is phase 0).
    2. PACED: 4 tenants at mixed rates summing to ~60% of the measured
       saturation (weighted 4:2:2:1) submit with per-request futures for
       ``duration_s``. Reports wall latency p50/p99 AND the compute-time
       SLA adherence: per-request latency = measured queue wait
       (dispatch_ts - arrival_ts, the scheduler's real contribution
       under this load) + the phase-0 device dispatch cost. The tunnel's
       RPC round trip (resolve_ts - dispatch_ts, absent on a PCIe host)
       is quoted separately, not buried in the SLA row.
    """
    import threading
    import numpy as np
    import jax
    import jax.numpy as jnp
    from aicamera_tpu.serving import MultiTenantTrackingService
    from scripts.axon_timing import fold_outputs

    def _mark(msg):
        print(f"[config26] {msg}", file=sys.stderr, flush=True)

    # The tunnel's RPC round trip swings 70 ms (healthy) to ~2.7 s
    # (degraded) — every wall/queue number below is meaningless in a
    # degraded window because the dispatch LOOP serializes behind the
    # RPC. Probe and idle until healthy (same defense as bench.py);
    # record the probe in the row.
    jax.device_get(jnp.zeros((64,), jnp.float32))
    probe = None
    for attempt in range(5):
        xs = []
        for i in range(3):
            x = jnp.asarray(np.full((64,), attempt * 3 + i + 1.0,
                                    np.float32))
            t0 = time.perf_counter()
            jax.device_get(x)
            xs.append((time.perf_counter() - t0) * 1e3)
        probe = sorted(xs)[1]
        if probe < 250.0:
            break
        _mark(f"tunnel degraded (probe {probe:.0f} ms) — idling 60s")
        time.sleep(60)

    frames = _load_clip(32)
    hw = frames.shape[1:3]
    sla_ms = 250.0
    n_streams, k = 4, 4
    # max_inflight 32: multi-second tunnel stalls must not backpressure
    # the dispatch loop (32 x ~25 MB staged chunks is well within HBM)
    svc = MultiTenantTrackingService(n_streams=n_streams, frame_hw=hw,
                                     chunk_size=k, max_latency_ms=sla_ms,
                                     max_inflight=32)
    errors: list = []
    try:
        # warm the fused step (compile happens on the first dispatch)
        _mark("warming fused step (first dispatch compiles)...")
        sid = svc.open_stream()
        svc.submit(sid, frames[0]).result(timeout=600)
        svc.close_stream(sid)
        svc.wait_idle()
        _mark("warm done")

        # --- phase 0: measured device time of the serving dispatch -------
        pipe = svc.pipeline
        if pipe._chunk_step_masked is None:
            pipe._chunk_step_masked = pipe._jit_with_shardings(
                pipe._chunk_step_raw,
                n_extra_stream_args=pipe._masked_extra)
        mstep = pipe._chunk_step_masked
        fv = jnp.ones((n_streams, k), bool)
        rng = np.random.RandomState(7)
        staged = []
        for i in range(14):
            # distinct buffers: rotate clip frames + per-buffer noise so
            # the tunneled runtime cannot short-circuit repeat dispatches
            idx = rng.randint(0, len(frames), size=(n_streams, k))
            staged.append(jnp.asarray(frames[idx]))
        jax.block_until_ready(staged)
        # The masked step DONATES its states argument: pipe.states is
        # invalid the moment the first call below runs, so the final
        # chained states MUST be written back even if the measurement
        # throws (no stream is open, so the service worker cannot
        # dispatch concurrently — but a failure here would otherwise
        # leave the later phases on deleted buffers).
        states = pipe.states
        try:
            # warm the chained path (2 dispatches + fetch)
            for i in range(2):
                states, outs = mstep(pipe.yolo_params, pipe.reid_params,
                                     states, staged[i], fv)
            jax.device_get(fold_outputs(outs))
            t0 = time.perf_counter()
            scalars = []
            for buf in staged[2:]:
                states, outs = mstep(pipe.yolo_params, pipe.reid_params,
                                     states, buf, fv)
                scalars.append(fold_outputs(outs))
            jax.device_get(scalars)
            t_dispatch = (time.perf_counter() - t0) / len(staged[2:])
        finally:
            # hand the (donated-through) states back to the service;
            # every open_stream resets its slot before first use anyway
            pipe.states = states
        dispatch_device_ms = t_dispatch * 1e3
        device_req_per_s = n_streams * k / t_dispatch
        _mark(f"phase 0 done: {dispatch_device_ms:.2f} ms/dispatch")
        del staged

        # --- phase 1: closed-loop saturation -----------------------------
        done = []
        done_lock = threading.Lock()

        def sat_client(window=8, dur=8.0):
            try:
                sid = svc.open_stream(max_latency_ms=1000.0)
                futs = []
                i = 0
                t_end = time.perf_counter() + dur
                while time.perf_counter() < t_end:
                    while len(futs) < window:
                        futs.append(
                            svc.submit(sid, frames[i % len(frames)]))
                        i += 1
                    futs.pop(0).result(timeout=120)
                for f in futs:
                    f.result(timeout=120)
                svc.close_stream(sid)
                with done_lock:
                    done.append(i)
            except Exception as e:  # noqa: BLE001
                errors.append(f"sat: {e!r}")

        t0 = time.perf_counter()
        sat_threads = [threading.Thread(target=sat_client)
                       for _ in range(4)]
        for t in sat_threads:
            t.start()
        for t in sat_threads:
            t.join()
        sat_rps = sum(done) / (time.perf_counter() - t0)
        _mark(f"saturation done: {sat_rps:.1f} req/s")
        svc.wait_idle()

        # --- phase 2: paced tenants at ~50% of capacity ------------------
        # Probe-gated (VERDICT r4 weak #3: wall adherence had only ever
        # been observed under a 7.2 s-RPC tunnel): idle until the tunnel
        # probes healthy BEFORE the paced window, probe again after, and
        # retry the whole paced phase once if the window degraded
        # mid-run — so the wall-time SLA row is either a healthy-window
        # measurement or explicitly marked degraded.
        _mark("idling 60s between phases (tunnel recovery)")
        time.sleep(60)
        # 0.3x saturation: the open-loop paced pattern fires more, smaller
        # dispatches than the window-8 closed loop that measured sat_rps,
        # so on this tunnel (per-RPC cost dominates) offered load above
        # ~1/3 of closed-loop saturation grows the queue without bound
        # (r5: 0.5x gave 33 s queue waits from a 12 s submission window)
        total = max(4.0, 0.3 * sat_rps)
        rates = tuple(round(total * w / 9.0, 1) for w in (4, 2, 2, 1))
        lat_lock = threading.Lock()

        def client(rate, results):
            my = []
            try:
                sid = svc.open_stream()
                period = 1.0 / rate
                futs = []
                t_end = time.perf_counter() + duration_s
                nxt = time.perf_counter()
                while time.perf_counter() < t_end:
                    futs.append(
                        svc.submit(sid, frames[len(futs) % len(frames)]))
                    nxt += period
                    dt = nxt - time.perf_counter()
                    if dt > 0:
                        time.sleep(dt)
                svc.close_stream(sid)
                # drain before recording: the slowest (last-queued)
                # requests are exactly the p99/SLA tail — dropping them
                # would make the latency rows systematically optimistic
                for f in futs:
                    my.append(f.result(timeout=300))
            except Exception as e:  # noqa: BLE001
                errors.append(f"paced: {e!r}")
            with lat_lock:
                results.extend(my)

        def paced_window():
            p_before, waited = _wait_healthy()
            results: list = []
            t0 = time.perf_counter()
            threads = [threading.Thread(target=client, args=(r, results))
                       for r in rates]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            svc.wait_idle()
            wall = time.perf_counter() - t0
            p_after = _probe_ms()
            rec = {"probe_before_ms": round(p_before, 1),
                   "probe_after_ms": round(p_after, 1),
                   "waited_s": waited,
                   "degraded": p_after >= 250.0}
            _mark(f"paced window: probe {p_before:.0f} -> {p_after:.0f} "
                  f"ms ({'degraded' if rec['degraded'] else 'healthy'})")
            return results, wall, rec

        results, wall, paced_rec = paced_window()
        if paced_rec["degraded"]:
            _mark("paced window degraded — idling 60s and retrying once")
            time.sleep(60)
            results2, wall2, rec2 = paced_window()
            if not rec2["degraded"] or not results:
                results, wall, paced_rec = results2, wall2, rec2
        stats = dict(svc.stats)
    finally:
        svc.shutdown()

    n = len(results)
    wall_ms = sorted((r.resolve_ts - r.arrival_ts) * 1e3 for r in results)
    queue_ms = sorted((r.dispatch_ts - r.arrival_ts) * 1e3
                      for r in results)
    rpc_ms = sorted((r.resolve_ts - r.dispatch_ts) * 1e3 for r in results)

    def _pct(xs, q):
        return xs[min(int(len(xs) * q), len(xs) - 1)] if xs else float("nan")

    # compute-time SLA: the scheduler's measured queue wait + the
    # measured device dispatch cost — everything a PCIe host would pay
    compute_lat_ms = [qw + dispatch_device_ms for qw in queue_ms]
    adherence = (sum(1 for v in compute_lat_ms if v <= sla_ms)
                 / max(n, 1))
    wall_adherence = (sum(1 for v in wall_ms if v <= sla_ms)
                      / max(n, 1))
    # The endpoint probes can be healthy while SUSTAINED dispatch
    # degrades the tunnel mid-run (CLAUDE.md) — the measured per-chunk
    # RPC is the ground truth for the window the wall rows lived in.
    rpc_p50 = _pct(rpc_ms, 0.5)
    if rpc_p50 > 10 * max(dispatch_device_ms, 1.0):
        paced_rec = dict(paced_rec, degraded=True,
                         midrun_rpc_p50_ms=round(rpc_p50, 1))
    # A 250 ms wall SLA cannot be met when one sustained transfer costs
    # ~1 s (environment, not scheduling) — also score a 10 s wall SLA so
    # the wall path has a meaningful measured number on this host.
    wall_adherence_10s = (sum(1 for v in wall_ms if v <= 10_000.0)
                          / max(n, 1))

    _emit("26_serving_multitenant", round(device_req_per_s, 1),
          unit="req_per_s_device",
          dispatch_device_ms=round(dispatch_device_ms, 2),
          sat_req_per_s=round(sat_rps, 1),
          paced_req_per_s=round(n / wall, 1),
          sla_ms=sla_ms,
          sla_adherence_compute=round(adherence, 3),
          sla_adherence_wall=round(wall_adherence, 3),
          sla_adherence_wall_10s=round(wall_adherence_10s, 3),
          queue_wait_p50_ms=round(_pct(queue_ms, 0.5), 1),
          queue_wait_p99_ms=round(_pct(queue_ms, 0.99), 1),
          compute_p50_ms=round(_pct(sorted(compute_lat_ms), 0.5), 1),
          compute_p99_ms=round(_pct(sorted(compute_lat_ms), 0.99), 1),
          paced_p50_ms=round(_pct(wall_ms, 0.5), 1),
          paced_p99_ms=round(_pct(wall_ms, 0.99), 1),
          tunnel_rpc_p50_ms=round(_pct(rpc_ms, 0.5), 1),
          streams=4, rates_fps=list(rates),
          scheduler_stats=stats,
          tunnel_probe_ms=round(probe, 1),
          paced_window_verdict=("degraded_window"
                                if paced_rec["degraded"] else "healthy"),
          paced_probe_before_ms=paced_rec["probe_before_ms"],
          paced_probe_after_ms=paced_rec["probe_after_ms"],
          errors=errors or None,
          note="req_per_s_device + dispatch_device_ms are MEASURED device "
               "time of the exact serving program (axon-safe chained "
               "dispatches, one fetch) — not a projection. "
               "sla_adherence_compute scores measured queue wait + "
               "measured device dispatch vs the 250 ms SLA (what a PCIe "
               "host pays); the tunnel's per-chunk RPC (absent on PCIe) "
               "is quoted in tunnel_rpc_p50_ms and dominates the wall "
               "rows on this dev runtime")


def config27_int8_reid(frames_n=288):
    """Int8 (W8A8) ReID A/B — the roofline's named remaining lever
    (docs/ROOFLINE.md: the embedder is 8x the detector's FLOPs at
    saturation; the MXU runs int8 at 2x the bf16 rate). Three paired
    rows, bf16 vs int8 on identical inputs: raw embed crops/s (config-12
    methodology), worst-case saturated tracking FPS (config-7 workload),
    and the realistic trained workload with MOTA/HOTA/IDSW quality gates
    (config-9 workload — quality must be within noise for the switch to
    be free)."""
    import jax
    import jax.numpy as jnp
    from scripts.axon_timing import measure
    from aicamera_tpu.models.quant import QuantReIDNet, quantize_reid_params
    from aicamera_tpu.runtime.params import resolve_reid_params
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    # --- raw embed throughput, bf16 vs int8 ------------------------------
    model, params = resolve_reid_params()
    qnet = QuantReIDNet()
    qparams = quantize_reid_params(params)
    cps = {}
    for name, net, p in (("bf16", model, params), ("int8", qnet, qparams)):
        @jax.jit
        def gen_fwd(p, seed, _net=net):
            x = jax.random.uniform(jax.random.PRNGKey(seed),
                                   (64, 128, 64, 3), jnp.float32)
            return _net.apply(p, x)

        runs = []
        for r in range(3):
            inputs = [(p, jnp.int32(2000 * r + i)) for i in range(48)]
            runs.append(64 / measure(gen_fwd, inputs, warmup=2))
        cps[name] = sorted(runs)[1]

    # --- worst-case saturated tracking (64 dets/frame) -------------------
    from aicamera_tpu import config as cfg
    arr = _load_clip(frames_n)
    wc = {}
    for name, quant in (("bf16", None), ("int8", "int8")):
        pipe = TrackingPipeline(chunk_size=96,
                                synthetic_load=cfg.MAX_DETECTIONS,
                                reid_quant=quant)
        runs, _ = _timed_run(pipe, arr)
        wc[name] = runs[1]

    # --- realistic trained workload + quality gates ----------------------
    quality = {}
    ckpt = _synthetic_checkpoints("27_int8_reid")
    if ckpt is not None:
        arr9, gt, _ = _trained_world_frames(frames_n)
        for name, quant in (("bf16", None), ("int8", "int8")):
            pipe = TrackingPipeline(chunk_size=96, yolo_weights=ckpt[0],
                                    reid_weights=ckpt[1], reid_quant=quant)
            runs, _ = _timed_run(pipe, arr9)
            mot, hota = _replay_quality(pipe, arr9, gt)
            quality[f"trained_fps_{name}"] = round(runs[1], 1)
            quality[f"mota_{name}"] = round(mot.mota, 3)
            quality[f"hota_{name}"] = round(hota.hota, 3)
            quality[f"idsw_{name}"] = mot.id_switches

    _emit("27_int8_reid", round(cps["int8"], 1), unit="crops_per_s",
          crops_per_s_bf16=round(cps["bf16"], 1),
          worst_case_fps_int8=round(wc["int8"], 1),
          worst_case_fps_bf16=round(wc["bf16"], 1), **quality,
          method="median_of_3, paired inputs",
          note="W8A8 dynamic quant (models/quant.py); quality gate: "
               "MOTA/HOTA within noise of bf16")


def config28_int8_yolo(frames_n=500):
    """Int8 (W8A8, static-calibrated) DETECTOR A/B (models/quant_yolo.py).
    The forward is HBM-bound (docs/ROOFLINE.md: ~113 MB activations/frame
    at bf16 vs a ~13.2 ms/chunk bandwidth floor); storing activations
    int8 halves the bytes and doubles the MXU MAC rate. Rows: raw
    batch-96 forward FPS (config-11 methodology), full clip headline
    FPS (config-3 workload), and trained-checkpoint detection quality
    (AP50 int8 vs bf16 on identical synthetic frames — the gate)."""
    import jax
    import jax.numpy as jnp
    from scripts.axon_timing import measure
    from aicamera_tpu.models.quant_yolo import QuantYOLOv8
    from aicamera_tpu.runtime.params import resolve_yolo_params
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    # --- raw forward, bf16 vs int8 ---------------------------------------
    model, params = resolve_yolo_params("n")
    pipe_q = TrackingPipeline(chunk_size=96, yolo_quant="int8")
    qmodel, qparams = pipe_q.yolo, pipe_q.yolo_params
    fps = {}
    for name, net, p, dt in (("bf16", model, params, jnp.bfloat16),
                             ("int8", qmodel, qparams, jnp.float32)):
        @jax.jit
        def gen_fwd(p, seed, _net=net, _dt=dt):
            x = jax.random.uniform(jax.random.PRNGKey(seed),
                                   (96, 640, 640, 3), _dt)
            return _net.apply(p, x)

        runs = []
        for r in range(3):
            inputs = [(p, jnp.int32(3000 * r + i)) for i in range(24)]
            runs.append(96 / measure(gen_fwd, inputs, warmup=2))
        fps[name] = sorted(runs)[1]

    # --- full-pipeline clip headline, bf16 vs int8 -----------------------
    arr = _load_clip(frames_n)
    clip = {}
    for name, quant in (("bf16", None), ("int8", "int8")):
        pipe = TrackingPipeline(chunk_size=96, yolo_quant=quant)
        runs, _ = _timed_run(pipe, arr)
        clip[name] = runs[1]

    # --- trained-checkpoint quality gate ---------------------------------
    quality = {}
    ckpt = _synthetic_checkpoints("28_int8_yolo")
    if ckpt is not None:
        from aicamera_tpu.eval import evaluate_detections
        arr9, _, gt_det = _trained_world_frames(96)
        for name, quant in (("bf16", None), ("int8", "int8")):
            pipe = TrackingPipeline(chunk_size=96, yolo_weights=ckpt[0],
                                    reid_weights=ckpt[1], yolo_quant=quant,
                                    conf_threshold=0.25)
            preds = [(r.det_boxes, r.det_scores, r.det_labels)
                     for r in pipe.process_frames(iter(list(arr9[:96])))]
            ap = evaluate_detections(gt_det[:96], preds)
            quality[f"ap50_{name}"] = round(ap.ap50, 3)
            quality[f"map_{name}"] = round(ap.map_5095, 3)

    _emit("28_int8_yolo", round(clip["int8"], 1),
          clip_fps_bf16=round(clip["bf16"], 1),
          raw_fwd_fps_int8=round(fps["int8"], 1),
          raw_fwd_fps_bf16=round(fps["bf16"], 1), **quality,
          method="median_of_3, paired inputs",
          note="static-calibrated W8A8 detector; gate: AP50 within 1 pt "
               "of bf16 on the trained synthetic workload")


def config29_crowd_quality(frames_n=192, score_frames=144):
    """Crowd-scale QUALITY benchmark (VERDICT r3 #4): ~85 concurrent
    visible identities per frame (128-slot world, size_scale 0.45,
    presence 0.95) with natural crossings and z-order occlusions,
    tracked at 192-slot capacity with a 100-detection slate and a
    64-crop ReID bucket — MOT/HOTA/IDSW columns at >= 64 live tracks
    for DeepSORT AND ByteTrack, where the capacity paths previously had
    perf-only rows (configs 5/7). The 192-slot table with
    scan_bucket=32 exercises the bucketed scan's high-slot skip and
    mid-chunk overflow fallbacks UNDER SCORING.

    Needs the crowd fine-tuned detector
    (``scripts/train_synthetic.py --crowd``): the base checkpoint's
    ~12-object training density finds only ~20% of this crowd."""
    import numpy as np
    from aicamera_tpu import config as cfg
    from aicamera_tpu.core.state import TrackerParams
    from aicamera_tpu.core.bytetrack import ByteTrackParams
    from aicamera_tpu.core.ocsort import OCSortParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

    root = Path(__file__).resolve().parent.parent
    crowd_w = root / "models" / "detection" / \
        "yolov8n_synthetic_crowd.msgpack"
    # crowd-fine-tuned embedder when present (VERDICT r4 #3) — small
    # occluded crops are where the base embedder is out-of-domain
    reid_crowd = root / "models" / "reid" / \
        "deepsort_reid_synthetic_crowd.msgpack"
    reid_w = (reid_crowd if reid_crowd.exists()
              else root / "models" / "reid"
              / "deepsort_reid_synthetic.msgpack")
    if not crowd_w.exists():
        print(json.dumps({"config": "29_crowd_quality", "value": None,
                          "note": "crowd checkpoint missing — run "
                                  "scripts/train_synthetic.py --crowd"}))
        return

    # occlusion_aware_gt: score only >=25%-visible objects (an object
    # painted over by the crowd is untrackable by construction).
    # 128 slots at 0.45 size scale keep ~86 objects visible concurrently
    # (the default-size 96-slot world buried all but ~24 — measured).
    # Sizes/scale MUST match scripts/train_synthetic.py::_crowd_world;
    # presence runs slightly ABOVE the training density (0.95 vs 0.9) —
    # a harder eval than the checkpoint saw, which is the honest
    # direction for a capacity benchmark.
    spec = WorldSpec(max_objects=128, presence=0.95, size_scale=0.45,
                     occlusion_aware_gt=True)
    world = TemporalWorld(spec, seed=11, speed=3.0)
    frames, gt = [], []
    for _ in range(frames_n):
        f, b, ids, cls, v = world.step()
        frames.append(f)
        gt.append((b[v], ids[v]))
    arr = np.stack(frames)
    gt_live = [len(b) for b, _ in gt]

    from aicamera_tpu.eval import evaluate_hota, evaluate_mot
    # all four shipped tracker families at crowd density (VERDICT r4 #3):
    # motion-only (bytetrack) vs the three appearance trackers, whose
    # min(iou, emb) fusion is exactly what the crowd embedder should arm
    for name, kwargs in (
            ("deepsort",
             {"tracker_params": TrackerParams(
                 max_tracks=192, max_detections=100,
                 feature_dim=cfg.REID_FEATURE_DIM),
              "reid_weights": str(reid_w) if reid_w.exists() else None,
              "max_reid_crops": 64}),
            ("bytetrack",
             {"tracker": "bytetrack",
              "bytetrack_params": ByteTrackParams(
                  max_tracks=192, max_detections=100)}),
            ("botsort",
             {"tracker": "botsort",
              "bytetrack_params": ByteTrackParams(
                  max_tracks=192, max_detections=100,
                  with_appearance=True,
                  feature_dim=cfg.REID_FEATURE_DIM),
              "reid_weights": str(reid_w) if reid_w.exists() else None,
              "max_reid_crops": 64}),
            ("deepocsort",
             {"tracker": "deepocsort",
              "ocsort_params": OCSortParams(
                  max_tracks=192, max_detections=100,
                  with_appearance=True,
                  feature_dim=cfg.REID_FEATURE_DIM),
              "reid_weights": str(reid_w) if reid_w.exists() else None,
              "max_reid_crops": 64})):
        pipe = TrackingPipeline(chunk_size=48, yolo_weights=str(crowd_w),
                                **kwargs)
        runs, n = _timed_run(pipe, arr, k=48)

        # quality replay: host-facing path, scored vs exact ground truth
        pipe.reset()
        hyp = []
        for res in pipe.process_frames(iter(list(arr[:score_frames]))):
            if res.tracks:
                hyp.append((np.asarray([t[:4] for t in res.tracks],
                                       np.float32),
                            np.asarray([t[4] for t in res.tracks],
                                       np.int64)))
            else:
                hyp.append((np.zeros((0, 4), np.float32),
                            np.zeros((0,), np.int64)))
        live = [len(h[1]) for h in hyp[5:]]
        # slot occupancy AFTER the replay: live tracks incl. coasting
        # (confirmed, tsu>0) — the table capacity actually exercised,
        # where live_tracks_* counts only emitted (tsu==0) rows
        import jax as _jax
        active_slots = int(np.asarray(
            _jax.device_get(pipe.state.active)).sum())
        mot = evaluate_mot(gt[5:score_frames], hyp[5:score_frames])
        hota = evaluate_hota(gt[5:score_frames], hyp[5:score_frames])
        _emit(f"29_crowd_quality_{name}", runs[1], frames=n,
              method="median_of_3",
              mota=round(mot.mota, 3), motp=round(mot.motp, 3),
              id_switches=mot.id_switches, hota=round(hota.hota, 3),
              ass_a=round(hota.ass_a, 3),
              live_tracks_mean=round(float(np.mean(live)), 1),
              live_tracks_max=int(np.max(live)),
              active_slots_final=active_slots,
              gt_visible_mean=round(float(np.mean(gt_live)), 1),
              track_slots=192, det_slate=100,
              reid_checkpoint=(reid_w.name if reid_w.exists() else None),
              note="128-slot crowd world (0.45 size scale, presence "
                   "0.95 eval vs 0.9 training); bucketed-scan overflow "
                   "paths active (scan_bucket 32 << live tracks); "
                   "appearance trackers embed a 64-crop bucket per frame")


def config30_crowd_overflow(frames_n=160, score_frames=144):
    """Track-table OVERFLOW under scoring (VERDICT r4 #4): a crowd world
    whose visible identity count exceeds what 192 slots can comfortably
    hold (224 slots at 0.35 size scale, presence 0.95 — target >= 128
    concurrently visible), tracked at the SAME 192-slot table config 29
    uses, plus a 384-slot headroom CONTROL run of the same tracker on
    the identical frames. The quality delta between the two rows is the
    measured cost of the overflow policy.

    OVERFLOW POLICY (documented): the slot allocator places each new
    tentative track at the lowest free slot; when no slot is free the
    detection initiates NOTHING that frame and the per-state ``dropped``
    counter increments (core/tracker.py::_initiate — the reference's
    unbounded Python list simply grows, src/tracker/core/
    tracker_core.py:180-193). Existing tracks are never evicted to make
    room: a confirmed track's slot frees only through the reference
    lifecycle (tentative miss, or tsu > max_age). The detection slate
    itself stays at the reference engine's 100-box NMS contract, so at
    >= 128 visible identities the detector under-reports every frame —
    which frames rotate through the slate is exactly the churn that
    pressures the table."""
    import numpy as np
    from aicamera_tpu import config as cfg
    from aicamera_tpu.core.state import TrackerParams
    from aicamera_tpu.core.bytetrack import ByteTrackParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

    root = Path(__file__).resolve().parent.parent
    crowd_w = root / "models" / "detection" / \
        "yolov8n_synthetic_crowd.msgpack"
    reid_crowd = root / "models" / "reid" / \
        "deepsort_reid_synthetic_crowd.msgpack"
    reid_w = (reid_crowd if reid_crowd.exists()
              else root / "models" / "reid"
              / "deepsort_reid_synthetic.msgpack")
    if not crowd_w.exists():
        print(json.dumps({"config": "30_crowd_overflow", "value": None,
                          "note": "crowd checkpoint missing — run "
                                  "scripts/train_synthetic.py --crowd"}))
        return

    spec = WorldSpec(max_objects=224, presence=0.95, size_scale=0.35,
                     occlusion_aware_gt=True)
    world = TemporalWorld(spec, seed=13, speed=3.0)
    frames, gt = [], []
    for _ in range(frames_n):
        f, b, ids, cls, v = world.step()
        frames.append(f)
        gt.append((b[v], ids[v]))
    arr = np.stack(frames)
    gt_live = [len(b) for b, _ in gt]

    from aicamera_tpu.eval import evaluate_hota, evaluate_mot
    import jax as _jax
    # the max_age=30 row is the measured slot-reclamation lever: at 155
    # identities, max_age=70 (reference default) keeps ~2.5 coasting
    # tracks per visible identity — shortening the coast window frees
    # slots without touching the overflow policy's semantics (it is the
    # reference's own parameter, config.py:27)
    for name, slots, max_age in (
            ("deepsort_192", 192, 70),
            ("deepsort_384_control", 384, 70),
            ("deepsort_192_maxage30", 192, 30),
            ("bytetrack_192", None, None)):
        if slots is None:
            kwargs = {"tracker": "bytetrack",
                      "bytetrack_params": ByteTrackParams(
                          max_tracks=192, max_detections=100)}
            slots = 192
        else:
            kwargs = {"tracker_params": TrackerParams(
                max_tracks=slots, max_detections=100, max_age=max_age,
                feature_dim=cfg.REID_FEATURE_DIM),
                "reid_weights": str(reid_w) if reid_w.exists() else None,
                "max_reid_crops": 64}
        pipe = TrackingPipeline(chunk_size=48, yolo_weights=str(crowd_w),
                                **kwargs)
        runs, n = _timed_run(pipe, arr, k=48)
        pipe.reset()
        hyp = []
        for res in pipe.process_frames(iter(list(arr[:score_frames]))):
            if res.tracks:
                hyp.append((np.asarray([t[:4] for t in res.tracks],
                                       np.float32),
                            np.asarray([t[4] for t in res.tracks],
                                       np.int64)))
            else:
                hyp.append((np.zeros((0, 4), np.float32),
                            np.zeros((0,), np.int64)))
        live = [len(h[1]) for h in hyp[5:]]
        active_slots = int(np.asarray(
            _jax.device_get(pipe.state.active)).sum())
        dropped = int(np.asarray(_jax.device_get(pipe.state.dropped)))
        mot = evaluate_mot(gt[5:score_frames], hyp[5:score_frames])
        hota = evaluate_hota(gt[5:score_frames], hyp[5:score_frames])
        _emit(f"30_crowd_overflow_{name}", runs[1], frames=n,
              method="median_of_3",
              mota=round(mot.mota, 3), motp=round(mot.motp, 3),
              id_switches=mot.id_switches, hota=round(hota.hota, 3),
              ass_a=round(hota.ass_a, 3),
              live_tracks_mean=round(float(np.mean(live)), 1),
              live_tracks_max=int(np.max(live)),
              active_slots_final=active_slots,
              dropped_detections=dropped,
              gt_visible_mean=round(float(np.mean(gt_live)), 1),
              track_slots=slots, det_slate=100,
              max_age=(max_age if max_age is not None else 30),
              reid_checkpoint=(reid_w.name if reid_w.exists() else None),
              note="224-slot world @ 0.35 scale; overflow policy: "
                   "table-full drops new tentatives (dropped counter), "
                   "never evicts live tracks; 384-slot control row "
                   "isolates the overflow cost; max_age=30 row is the "
                   "slot-reclamation tuning lever")


CONFIGS = {1: config1_detect_cpu, 2: config2_detect_clip,
           3: config3_full_tracking, 4: config4_multistream,
           5: config5_yolov8m_1080p, 6: config6_streaming_e2e,
           7: config7_worst_case_load, 8: config8_latency,
           9: config9_synthetic_trained, 10: config10_multistream_trained,
           11: config11_raw_detector, 12: config12_raw_reid,
           13: config13_yolov8x_4k, 14: config14_auto_input,
           15: config15_bytetrack_clip, 16: config16_bytetrack_trained,
           17: config17_ocsort_clip, 18: config18_ocsort_trained,
           19: config19_ema_gallery_trained, 20: config20_gmc_pan,
           21: config21_nsa_trained, 22: config22_botsort_trained,
           23: config23_strongsort_trained,
           24: config24_deepocsort_trained, 25: config25_tiled_4k,
           26: config26_serving, 27: config27_int8_reid,
           28: config28_int8_yolo, 29: config29_crowd_quality,
           30: config30_crowd_overflow}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, choices=sorted(CONFIGS))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--mesh", type=str, default=None,
                    help="SxM ('stream','model') mesh for config 5, "
                         "e.g. 2x4 (tensor parallelism).")
    ap.add_argument("--out", type=str, default=None,
                    help="also append each result JSON line to this file")
    args = ap.parse_args()
    global _OUT_PATH
    if args.out:
        _OUT_PATH = Path(args.out)
    targets = sorted(CONFIGS) if args.all else [args.config or 3]
    for t in targets:
        if t == 1 and len(targets) > 1:
            # config 1 forces the CPU backend, which cannot be undone in
            # this process once other configs have touched the TPU —
            # isolate it (also avoids two TPU-attached processes).
            import subprocess
            cmd = [sys.executable, __file__, "--config", "1"]
            if args.out:
                cmd += ["--out", args.out]
            subprocess.run(cmd, check=False)
        elif t == 5 and args.mesh:
            config5_yolov8m_1080p(mesh_spec=args.mesh)
        else:
            CONFIGS[t]()


if __name__ == "__main__":
    main()
