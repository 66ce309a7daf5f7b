"""Detection-level batch-1 vs chunked-batch A/B on the reference clip.

Isolates WHERE the production pipeline's divergence from the batch-1
facade enters (VERDICT r4 #1 diagnosis): compares RAW per-frame
detections — boxes, scores, labels after NMS + conf filter — between

  * the facade detect path (``YOLODetector.detect``, batch-1, XLA
    letterbox), and
  * the chunked pipeline detect (batch-96 ``detect_batch`` inside
    ``TrackingPipeline``'s fused step, Pallas or XLA letterbox),

at bf16 and/or f32, WITHOUT any tracking downstream. If detections
already differ here, the tracker-agreement gap starts in detect (input
perturbation or batch-shape numerics); if they match, the gap enters in
ReID bucketing / association instead.

Usage (TPU): python scripts/detect_ab.py [--frames 200]
    [--arms bf16:pallas,bf16:xla,f32:xla]
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
CLIP = Path("/root/reference/assets/aicamera_test_clip.mp4")


def load_clip(n):
    import cv2
    cap = cv2.VideoCapture(str(CLIP))
    frames = []
    while len(frames) < n:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def frame_dets_facade(frames, weights, dtype, conf):
    from aicamera_tpu.detector import YOLODetector
    det = YOLODetector(engine_path=weights, conf_threshold=conf,
                       detect_dtype=dtype)
    out = []
    for f in frames:
        b, s, c, _ = det.detect(f)
        out.append((np.asarray(b, np.float32).reshape(-1, 4),
                    np.asarray(s, np.float32).reshape(-1),
                    np.asarray(c).reshape(-1)))
    del det
    gc.collect()
    return out


def frame_dets_pipeline(frames, weights, dtype, preproc, conf, chunk=96):
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(chunk_size=chunk, yolo_weights=weights,
                            conf_threshold=conf, with_reid=False,
                            tracker="bytetrack", detect_dtype=dtype,
                            preprocess_impl=preproc)
    out = []
    for res in pipe.process_frames(iter(list(frames))):
        out.append((np.asarray(res.det_boxes, np.float32).reshape(-1, 4),
                    np.asarray(res.det_scores, np.float32).reshape(-1),
                    np.asarray(res.det_labels).reshape(-1)))
    del pipe
    gc.collect()
    return out


def compare(fa, fb, box_tol=1.0):
    """Per-frame greedy matching of detection sets; returns summary."""
    ident = 0
    matched = extra_a = extra_b = 0
    dscore = []
    dbox = []
    for (ba, sa, ca), (bb, sb, cb) in zip(fa, fb):
        used = np.zeros(len(bb), bool)
        frame_match = len(ba) == len(bb)
        for j in range(len(ba)):
            best, bi = 1e9, -1
            for m in range(len(bb)):
                if used[m] or cb[m] != ca[j]:
                    continue
                d = np.abs(ba[j] - bb[m]).max()
                if d < best:
                    best, bi = d, m
            if bi >= 0 and best <= box_tol:
                used[bi] = True
                matched += 1
                dscore.append(abs(float(sa[j]) - float(sb[bi])))
                dbox.append(best)
            else:
                extra_a += 1
                frame_match = False
        extra_b += int((~used).sum())
        if (~used).any():
            frame_match = False
        ident += frame_match
    return {"frames_det_identical": ident,
            "matched": matched, "only_facade": extra_a,
            "only_pipeline": extra_b,
            "score_absdiff_mean": round(float(np.mean(dscore)), 6)
            if dscore else 0.0,
            "score_absdiff_p99": round(
                float(np.percentile(dscore, 99)), 6) if dscore else 0.0,
            "box_absdiff_mean": round(float(np.mean(dbox)), 4)
            if dbox else 0.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--weights", default=str(
        ROOT / "models" / "detection" / "yolov8n_clip_adapted.msgpack"))
    ap.add_argument("--arms", default="bf16:pallas,bf16:xla,f32:xla")
    ap.add_argument("--json_out", default=str(
        ROOT / "benchmarks" / "detect_ab.jsonl"))
    args = ap.parse_args()

    frames = load_clip(args.frames)
    print(f"{len(frames)} frames", flush=True)

    facade_cache: dict = {}
    for arm in args.arms.split(","):
        dtype, _, preproc = arm.partition(":")
        preproc = preproc or "auto"
        ddt = None if dtype == "bf16" else "f32"
        if dtype not in facade_cache:
            facade_cache[dtype] = frame_dets_facade(
                frames, args.weights, ddt, args.conf)
            print(f"facade[{dtype}] done "
                  f"({np.mean([len(d[1]) for d in facade_cache[dtype]]):.1f}"
                  f" dets/frame)", flush=True)
        pl = frame_dets_pipeline(frames, args.weights, ddt, preproc,
                                 args.conf)
        row = {"arm": arm, "frames": len(frames),
               **compare(facade_cache[dtype], pl)}
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.json_out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
