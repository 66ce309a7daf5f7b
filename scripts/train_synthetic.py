"""Train YOLOv8n on the synthetic world and save a functional checkpoint.

No external inputs: scenes are generated on device
(:mod:`aicamera_tpu.synthetic`), the trainer is
:mod:`aicamera_tpu.train`, and the result is evaluated (precision/recall
at IoU 0.5 + class match, through the REAL detect path incl. letterbox
preprocess, DFL decode and NMS) before being saved to
``models/detection/yolov8n_synthetic.msgpack``. The saved checkpoint
powers the hardware-free functional regression tests
(``tests/test_functional_synthetic.py``) and the realistic-load benchmark.

Usage: python scripts/train_synthetic.py [--steps 3000] [--batch 8]
           [--eval-only] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_OUT = Path(__file__).resolve().parent.parent / \
    "models" / "detection" / "yolov8n_synthetic.msgpack"
CROWD_OUT = DEFAULT_OUT.with_name("yolov8n_synthetic_crowd.msgpack")


def _crowd_world():
    from aicamera_tpu.synthetic import WorldSpec
    # occlusion_aware_gt: training/eval only on >=25%-visible objects
    # (MOTChallenge-style) keeps the targets learnable. size_scale 0.45
    # + 128 slots: default-size objects carry ~1.8x the frame's area so
    # mutual occlusion buries most of them (measured 23.7 visible of
    # ~72); at 0.45 scale a genuine ~83 objects stay visible
    # concurrently — the capacity the crowd benchmark exists to score.
    return WorldSpec(max_objects=128, presence=0.9, size_scale=0.45,
                     occlusion_aware_gt=True)


def evaluate(model, params, world, input_hw, n_scenes=48, conf=0.3,
             iou_match=0.5, seed=7777):
    """Precision/recall of the full detect path on fresh scenes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu.eval import _iou_matrix
    from aicamera_tpu.ops.nms import fused_decode_nms
    from aicamera_tpu.ops.preprocess import (letterbox_spec,
                                             preprocess_yolo,
                                             scale_boxes_back)
    from aicamera_tpu.synthetic import random_scene

    spec = letterbox_spec(world.hw, input_hw)

    @jax.jit
    def detect_batch(params, keys):
        frames, gtb, gtc, gtv = jax.vmap(
            lambda k: random_scene(k, world))(keys)
        x = jax.vmap(lambda f: preprocess_yolo(
            f, spec, out_dtype=model.dtype)[0])(frames)
        levels = model.apply(params, x)
        num, boxes, scores, labels = fused_decode_nms(
            levels, score_threshold=0.25, iou_threshold=0.5)
        return (num, scale_boxes_back(boxes, spec), scores, labels,
                gtb, gtc, gtv)

    b = 8
    tp = fp = fn = 0
    gt_frames, pred_frames = [], []   # for COCO mAP (eval.py)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_scenes)
    for i in range(0, n_scenes, b):
        out = detect_batch(params, keys[i:i + b])
        num, boxes, scores, labels, gtb, gtc, gtv = map(np.asarray, out)
        for j in range(len(num)):
            # AP scores the full PR curve: ALL decoded detections (down to
            # the NMS score floor of 0.25), not just those above the
            # precision/recall report threshold `conf`
            keep = list(range(int(num[j])))
            pred_frames.append((boxes[j, keep], scores[j, keep],
                                labels[j, keep]))
            gt_frames.append((gtb[j][gtv[j]], gtc[j][gtv[j]]))
            det = [(boxes[j, d], labels[j, d], scores[j, d])
                   for d in range(num[j]) if scores[j, d] >= conf]
            det.sort(key=lambda t: -t[2])
            gt = [(gtb[j, g], gtc[j, g]) for g in range(len(gtv[j]))
                  if gtv[j, g]]
            used = [False] * len(gt)
            iou = _iou_matrix(
                np.array([d[0] for d in det], np.float32).reshape(-1, 4),
                np.array([g[0] for g in gt], np.float32).reshape(-1, 4))
            for di, (_, dcls, _s) in enumerate(det):
                best, bi = 0.0, -1
                for g, (_, gcls) in enumerate(gt):
                    if used[g] or gcls != dcls:
                        continue
                    if iou[di, g] > best:
                        best, bi = float(iou[di, g]), g
                if best >= iou_match:
                    used[bi] = True
                    tp += 1
                else:
                    fp += 1
            fn += used.count(False)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    from aicamera_tpu.eval import evaluate_detections
    ap = evaluate_detections(gt_frames, pred_frames)
    return prec, rec, tp, fp, fn, ap


def evaluate_reid(model, params, world, n_scenes=24, seed=5555):
    """Identity separation of the embedder: same-instance vs
    different-instance cosine distance across two views per scene."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu.ops.crops import extract_reid_crops
    from aicamera_tpu.synthetic import ground_truth, random_objects, render

    @jax.jit
    def views(key):
        ko, ka, kb = jax.random.split(key, 3)
        obj = random_objects(ko, world)
        boxes, _, valid = ground_truth(obj, world)
        ca, va = extract_reid_crops(render(obj, world, ka), boxes,
                                    compute_dtype=model.dtype)
        cb, vb = extract_reid_crops(render(obj, world, kb), boxes,
                                    compute_dtype=model.dtype)
        za = model.apply(params, ca).astype(jnp.float32)
        zb = model.apply(params, cb).astype(jnp.float32)
        return za, zb, valid & va & vb

    intra, inter = [], []
    for k in jax.random.split(jax.random.PRNGKey(seed), n_scenes):
        za, zb, v = map(np.asarray, views(k))
        d = 1.0 - za @ zb.T
        for i in range(len(v)):
            if not v[i]:
                continue
            intra.append(d[i, i])
            inter.extend(d[i, v & (np.arange(len(v)) != i)])
    return float(np.mean(intra)), float(np.mean(inter)), \
        float(np.percentile(intra, 95)), float(np.percentile(inter, 5))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reid", action="store_true",
                    help="train the ReID embedder instead of the detector")
    # None = per-mode default (detector: 3000 steps / batch 8 / lr 2e-3;
    # reid: 1500 steps / 4 scenes / lr 1e-3). Explicit values are always
    # honored in both modes.
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None,
                    help="images per step (detector) / scenes per step "
                         "(reid)")
    ap.add_argument("--scan", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--out", type=str, default=str(DEFAULT_OUT))
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--min-prec", type=float, default=0.85)
    # None = per-mode default (0.85; crowd: 0.6) — explicit values are
    # always honored, including --crowd --min-rec 0.85
    ap.add_argument("--min-rec", type=float, default=None)
    ap.add_argument("--crowd", action="store_true",
                    help="fine-tune a CROWD-density detector (128-slot "
                         "world at size_scale 0.45, ~83 visible "
                         "objects/scene with heavy z-order occlusion) "
                         "warm-started from the base synthetic "
                         "checkpoint; saves to "
                         "yolov8n_synthetic_crowd.msgpack. The base "
                         "checkpoint's ~12-object training density only "
                         "finds ~20% of this crowd (measured) — density "
                         "is out-of-distribution, so benchmark config "
                         "29 needs this checkpoint.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from aicamera_tpu.runtime.engine import enable_persistent_cache
    enable_persistent_cache()
    from aicamera_tpu.synthetic import WorldSpec
    from aicamera_tpu.train import TrainConfig, train_detector

    world = WorldSpec()
    input_hw = (640, 640)
    out = Path(args.out)
    if args.crowd:
        world = _crowd_world()
        if args.out == str(DEFAULT_OUT):
            out = CROWD_OUT
        if not args.reid:
            # crowd DETECTOR fine-tune defaults: fewer steps, gentler LR
            # (warm start), smaller batch (the 128-slot renderer's
            # (N, H, W) ownership masks are ~10x the default world's
            # memory). The reid branch sets its own crowd defaults.
            if args.steps is None:
                args.steps = 2000
            if args.lr is None:
                args.lr = 5e-4
            if args.batch is None:
                args.batch = 4
            # occlusion-heavy scenes cap attainable recall below the
            # sparse world's even with visibility-filtered gt
            if args.min_rec is None:
                args.min_rec = 0.6
    if args.min_rec is None:
        args.min_rec = 0.85
    print(f"backend={jax.default_backend()}")

    if args.reid:
        from aicamera_tpu.train import ReIDTrainConfig, train_reid
        base_reid = DEFAULT_OUT.parent.parent / "reid" / \
            "deepsort_reid_synthetic.msgpack"
        if args.out != str(DEFAULT_OUT):
            reid_out = Path(args.out)
        elif args.crowd:
            # crowd fine-tune (VERDICT r4 #3): the detector got a crowd
            # checkpoint in r4 but the embedder didn't — appearance cost
            # on tiny occluded crowd crops is exactly where the base
            # synthetic embedder is out-of-domain, and appearance is
            # DeepSORT's whole differentiator at crowd density.
            reid_out = base_reid.with_name(
                "deepsort_reid_synthetic_crowd.msgpack")
        else:
            reid_out = base_reid
        if args.eval_only:
            from aicamera_tpu.runtime.params import resolve_reid_params
            model, params = resolve_reid_params(weights_path=str(reid_out))
        else:
            base = ReIDTrainConfig()
            init_params = None
            if args.crowd:
                # warm start + crowd defaults: gentler LR, fewer steps
                # (the base embedder's conv features transfer; the margin
                # structure on small occluded crops is what's retrained)
                if args.steps is None:
                    args.steps = 1500
                if args.lr is None:
                    args.lr = 5e-4
                if base_reid.exists():
                    from aicamera_tpu.runtime.params import \
                        resolve_reid_params
                    print(f"warm-starting from {base_reid.name}")
                    _, init_params = resolve_reid_params(
                        weights_path=str(base_reid))
            cfg = ReIDTrainConfig(
                steps=args.steps if args.steps is not None else base.steps,
                scenes=args.batch if args.batch is not None else base.scenes,
                scan=args.scan if args.scan is not None else base.scan,
                lr=args.lr if args.lr is not None else base.lr)
            t0 = time.time()
            model, params = train_reid(world=world, cfg=cfg,
                                       params=init_params)
            print(f"trained reid in {time.time() - t0:.0f}s")
        intra, inter, intra95, inter5 = evaluate_reid(model, params, world)
        print(json.dumps({"intra_mean": round(intra, 4),
                          "inter_mean": round(inter, 4),
                          "intra_p95": round(intra95, 4),
                          "inter_p5": round(inter5, 4),
                          "world": "crowd" if args.crowd else "default"}))
        if args.eval_only:
            return
        # the appearance gate is 0.2 cosine distance (reference MAX_DIST):
        # same-identity pairs must sit inside it, others far outside.
        # inter_p5 bar 0.25 (not 0.3): a 1500-step run lands around 0.30
        # +- run variance (the default is now 2500 steps, measuring
        # ~0.40), and a retrain in a fresh workspace must not flake at
        # the save gate; 0.25 still clears the 0.2 appearance gate.
        # Crowd crops are tiny and mutually occluded — the attainable
        # margin is structurally lower (identity evidence is a sliver of
        # the crop), so the crowd gate asks for a usable margin rather
        # than the sparse world's comfortable one.
        intra_bar, inter_bar = (0.2, 0.2) if args.crowd else (0.15, 0.25)
        if intra95 > intra_bar or inter5 < inter_bar:
            print(f"embedding margin below bar (intra_p95 {intra95:.3f} "
                  f"> {intra_bar} or inter_p5 {inter5:.3f} < {inter_bar}) "
                  "— NOT saving", file=sys.stderr)
            sys.exit(1)
        reid_out.parent.mkdir(parents=True, exist_ok=True)
        with open(reid_out, "wb") as f:
            f.write(serialization.to_bytes(params))
        print(f"saved {reid_out} ({reid_out.stat().st_size / 1e6:.1f} MB)")
        return

    if args.eval_only:
        from aicamera_tpu.runtime.params import resolve_yolo_params
        model, params = resolve_yolo_params("n", weights_path=str(out))
    else:
        base = TrainConfig()
        cfg = TrainConfig(
            steps=args.steps if args.steps is not None else base.steps,
            batch=args.batch if args.batch is not None else base.batch,
            scan=args.scan if args.scan is not None else base.scan,
            lr=args.lr if args.lr is not None else base.lr)
        init_params = None
        if args.crowd and DEFAULT_OUT.exists():
            from aicamera_tpu.runtime.params import resolve_yolo_params
            print(f"warm-starting from {DEFAULT_OUT.name}")
            _, init_params = resolve_yolo_params(
                "n", weights_path=str(DEFAULT_OUT))
        t0 = time.time()
        model, params = train_detector(world=world, input_hw=input_hw,
                                       cfg=cfg, params=init_params)
        print(f"trained {cfg.steps} steps in {time.time() - t0:.0f}s")

    prec, rec, tp, fp, fn, ap = evaluate(model, params, world, input_hw)
    print(json.dumps({"precision": round(prec, 4), "recall": round(rec, 4),
                      "tp": tp, "fp": fp, "fn": fn,
                      "ap50": round(ap.ap50, 4),
                      "ap75": round(ap.ap75, 4),
                      "map_5095": round(ap.map_5095, 4),
                      "ap_score_floor": 0.25}))
    if args.eval_only:
        return
    if prec < args.min_prec or rec < args.min_rec:
        print(f"below bar (min_prec={args.min_prec}, min_rec={args.min_rec})"
              " — NOT saving", file=sys.stderr)
        sys.exit(1)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"saved {out} ({out.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
