"""Self-train the detector on the reference clip (no network needed).

Closes the real-video domain gap (VERDICT r3 missing #2): the synthetic
checkpoint's score margins collapse on real footage, so the chunked
pipeline's batch-shape bf16 numerics flip NMS ordering vs the batch-1
facade (row agreement 68.6% on the clip vs 96.5% in-domain,
docs/CLIP_PARITY.md). Pseudo-labeling the clip with the checkpoint's own
HIGH-confidence detections and fine-tuning on them (mixed 50/50 with
fresh synthetic scenes so the synthetic-world competence survives)
sharpens the margins on the real domain.

Pipeline:
 1. Decode all clip frames; detect with the base checkpoint (chunked
    fused path, conf 0.25).
 2. Keep detections with score >= --conf_hi (default 0.5) that are
    TEMPORALLY CONSISTENT: an IoU >= 0.5 same-class match in an adjacent
    frame (one-frame flickers are the classic pseudo-label poison).
 3. Fine-tune from the base params (aicamera_tpu.train.finetune_on_clip:
    flip + photometric augmentation on device, lax.scan'd steps).
 4. Gate on the synthetic world (precision/recall must stay above
    --min_prec/--min_rec) and save yolov8n_clip_adapted.msgpack.

Then measure the before/after agreement:
    python scripts/clip_parity.py --pipeline_check                 # before
    python scripts/clip_parity.py --pipeline_check \
        --weights models/detection/yolov8n_clip_adapted.msgpack    # after

Usage: python scripts/selftrain_clip.py [--steps 1500] [--conf_hi 0.5]
(TPU, sequential — never run in parallel with another TPU process.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

CLIP = Path("/root/reference/assets/aicamera_test_clip.mp4")
BASE = ROOT / "models" / "detection" / "yolov8n_synthetic.msgpack"
OUT = ROOT / "models" / "detection" / "yolov8n_clip_adapted.msgpack"
MAX_LABELS = 64


def load_clip(path, max_frames=0):
    import cv2
    cap = cv2.VideoCapture(str(path))
    frames = []
    while not max_frames or len(frames) < max_frames:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


def detect_all(frames, weights, conf=0.25):
    """Chunked detect over all frames; returns per-frame
    (boxes, scores, labels) in source coords."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(chunk_size=96, yolo_weights=str(weights),
                            conf_threshold=conf, with_reid=False,
                            tracker="bytetrack")  # cheapest tracker core
    dets = []
    for res in pipe.process_frames(iter(list(frames))):
        dets.append((np.asarray(res.det_boxes, np.float32).reshape(-1, 4),
                     np.asarray(res.det_scores, np.float32).reshape(-1),
                     np.asarray(res.det_labels).reshape(-1)))
    return dets


def _iou_one_vs_many(a, bs):
    if len(bs) == 0:
        return np.zeros((0,), np.float32)
    x1 = np.maximum(a[0], bs[:, 0])
    y1 = np.maximum(a[1], bs[:, 1])
    x2 = np.minimum(a[2], bs[:, 2])
    y2 = np.minimum(a[3], bs[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (bs[:, 2] - bs[:, 0]) * (bs[:, 3] - bs[:, 1]) - inter)
    return inter / np.maximum(ua, 1e-9)


def pseudo_labels(dets, conf_hi=0.5, iou_consistent=0.5):
    """High-confidence + temporally consistent labels, padded to
    (F, MAX_LABELS, ...). Returns (boxes, cls, valid, stats)."""
    n = len(dets)
    hi = []
    for b, s, c in dets:
        keep = s >= conf_hi
        hi.append((b[keep], c[keep]))
    boxes = np.zeros((n, MAX_LABELS, 4), np.float32)
    cls = np.zeros((n, MAX_LABELS), np.int32)
    valid = np.zeros((n, MAX_LABELS), bool)
    kept = raw = 0
    for i, (b, c) in enumerate(hi):
        raw += len(b)
        k = 0
        for j in range(len(b)):
            ok = False
            for adj in (i - 1, i + 1):
                if not (0 <= adj < n):
                    continue
                ab, ac = hi[adj]
                same = ac == c[j]
                if same.any() and \
                        _iou_one_vs_many(b[j], ab[same]).max() \
                        >= iou_consistent:
                    ok = True
                    break
            if ok and k < MAX_LABELS:
                boxes[i, k] = b[j]
                cls[i, k] = c[j]
                valid[i, k] = True
                k += 1
        kept += k
    stats = {"frames": n, "raw_hi_conf": raw, "kept_consistent": kept,
             "labels_per_frame": round(kept / max(n, 1), 2)}
    return boxes, cls, valid, stats


def label_agreement(dets, boxes, cls, valid, idx, conf=0.5,
                    iou_match=0.5):
    """Precision/recall of per-frame detections (>= conf) vs the pseudo
    labels, restricted to frame indices ``idx``. The held-out version of
    this (frames excluded from fine-tuning) is the real-video progress
    metric VERDICT r4 #1 asks for: training-frame agreement rising while
    held-out agreement stalls = pseudo-label overfit, both rising =
    genuine domain adaptation."""
    tp = fp = fn = 0
    for i in idx:
        b, s, c = dets[i]
        keep = s >= conf
        db, dc = b[keep], c[keep]
        lb = boxes[i][valid[i]]
        lc = cls[i][valid[i]]
        used = np.zeros(len(lb), bool)
        for j in range(len(db)):
            best, bi = 0.0, -1
            for m in range(len(lb)):
                if used[m] or lc[m] != dc[j]:
                    continue
                iou = _iou_one_vs_many(db[j], lb[m:m + 1])[0]
                if iou > best:
                    best, bi = iou, m
            if best >= iou_match:
                used[bi] = True
                tp += 1
            else:
                fp += 1
        fn += int((~used).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return {"precision": round(prec, 4), "recall": round(rec, 4),
            "tp": tp, "fp": fp, "fn": fn, "frames": len(idx)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=str(CLIP))
    ap.add_argument("--weights", default=str(BASE))
    ap.add_argument("--out", default=str(OUT))
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--conf_hi", type=float, default=0.5)
    ap.add_argument("--synthetic_frac", type=float, default=0.5)
    ap.add_argument("--min_prec", type=float, default=0.85)
    ap.add_argument("--min_rec", type=float, default=0.85)
    ap.add_argument("--holdout_every", type=int, default=5,
                    help="hold every Nth frame OUT of fine-tuning and "
                         "use its pseudo-labels as a real-video "
                         "validation split (0 disables — pre-r5 "
                         "behavior). Held-out label agreement is "
                         "measured before and after training.")
    args = ap.parse_args()

    import jax
    from flax import serialization

    from aicamera_tpu.runtime.engine import enable_persistent_cache
    enable_persistent_cache()
    from aicamera_tpu.runtime.params import resolve_yolo_params
    from aicamera_tpu.synthetic import WorldSpec
    from aicamera_tpu.train import TrainConfig, finetune_on_clip
    from train_synthetic import evaluate  # synthetic-world quality gate

    print(f"backend={jax.default_backend()}")
    frames = load_clip(args.input, args.frames)
    print(f"{len(frames)} frames from {Path(args.input).name}")

    t0 = time.time()
    dets = detect_all(frames, args.weights)
    print(f"detect pass {time.time() - t0:.0f}s "
          f"({np.mean([len(d[1]) for d in dets]):.1f} raw dets/frame)")
    # free the detect pipeline's device buffers before the trainer
    # stages the clip + optimizer state (observed marginal HBM OOM on
    # the first train dispatch otherwise)
    import gc
    gc.collect()
    boxes, cls, valid, stats = pseudo_labels(dets, args.conf_hi)
    print(f"pseudo-labels: {json.dumps(stats)}")
    if stats["labels_per_frame"] < 1.0:
        sys.exit("too few pseudo-labels — lower --conf_hi or check the "
                 "base checkpoint")

    # Held-out real-frame validation split: every Nth frame is excluded
    # from fine-tuning; its pseudo-labels stay as a validation target.
    n = len(frames)
    if args.holdout_every > 0:
        hold_idx = list(range(0, n, args.holdout_every))
        train_idx = [i for i in range(n) if i % args.holdout_every != 0]
    else:
        hold_idx, train_idx = [], list(range(n))
    if hold_idx:
        before_hold = label_agreement(dets, boxes, cls, valid, hold_idx)
        before_train = label_agreement(dets, boxes, cls, valid, train_idx)
        print(f"label agreement BEFORE (starting checkpoint): "
              f"holdout {json.dumps(before_hold)} "
              f"train {json.dumps(before_train)}")

    _, params = resolve_yolo_params("n", weights_path=args.weights)
    cfg = TrainConfig(steps=args.steps, batch=args.batch, lr=args.lr)
    t0 = time.time()
    tr = np.asarray(train_idx, np.int64)
    model, params = finetune_on_clip(
        frames[tr], boxes[tr], cls[tr], valid[tr], params, cfg=cfg,
        synthetic_world=WorldSpec(),
        synthetic_frac=args.synthetic_frac)
    print(f"fine-tuned {args.steps} steps in {time.time() - t0:.0f}s "
          f"({len(train_idx)}/{n} frames; {len(hold_idx)} held out)")

    # Gate: the adapted checkpoint must RETAIN synthetic-world competence
    # (the mixed batches exist for exactly this); the real-video win is
    # then measured by clip_parity --pipeline_check, not asserted here.
    prec, rec, tp, fp, fn, apq = evaluate(model, params, WorldSpec(),
                                          (640, 640))
    print(json.dumps({"synthetic_precision": round(prec, 4),
                      "synthetic_recall": round(rec, 4),
                      "ap50": round(apq.ap50, 4)}))
    if prec < args.min_prec or rec < args.min_rec:
        print("synthetic-world quality regressed below bar — NOT saving",
              file=sys.stderr)
        sys.exit(1)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"saved {out} ({out.stat().st_size / 1e6:.1f} MB)")

    # AFTER: re-detect with the adapted checkpoint and measure label
    # agreement on the held-out split (the labels were produced by the
    # STARTING checkpoint, so this is measured against a fixed target:
    # held-out improvement = genuine adaptation, train-only improvement
    # = pseudo-label overfit).
    if hold_idx:
        gc.collect()
        dets_after = detect_all(frames, out)
        after_hold = label_agreement(dets_after, boxes, cls, valid,
                                     hold_idx)
        after_train = label_agreement(dets_after, boxes, cls, valid,
                                      train_idx)
        print(f"label agreement AFTER (adapted checkpoint): "
              f"holdout {json.dumps(after_hold)} "
              f"train {json.dumps(after_train)}")
        summary = {
            "holdout_f1_before": round(
                2 * before_hold["precision"] * before_hold["recall"]
                / max(before_hold["precision"] + before_hold["recall"],
                      1e-9), 4),
            "holdout_f1_after": round(
                2 * after_hold["precision"] * after_hold["recall"]
                / max(after_hold["precision"] + after_hold["recall"],
                      1e-9), 4),
            "train_f1_after": round(
                2 * after_train["precision"] * after_train["recall"]
                / max(after_train["precision"] + after_train["recall"],
                      1e-9), 4)}
        summary["overfit_gap"] = round(
            summary["train_f1_after"] - summary["holdout_f1_after"], 4)
        print(f"holdout summary: {json.dumps(summary)}")


if __name__ == "__main__":
    main()
