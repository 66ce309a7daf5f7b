"""Clip-scale track-ID parity: our tracker vs the reference's own core.

The BASELINE north star asks for *track-ID parity on
assets/aicamera_test_clip.mp4*. The smaller oracle tests
(tests/test_reference_oracle.py, tests/test_facade_oracle.py) prove
semantic equivalence on synthetic scenes; this harness proves it at clip
scale: it runs OUR full detect path (YOLOv8n, self-trained synthetic
checkpoint by default) over all 500 real frames, feeds the identical
post-filter detections *and the identical on-device appearance features*
(captured via DeepSORT(capture_features=True)) to the reference's actual
``TrackerCore`` (/root/reference/src/tracker/core — pure NumPy/SciPy,
imported directly), and compares, frame by frame:

  * the emitted set — confirmed tracks with time_since_update == 0,
    formatted exactly like the reference facade
    (reference deepsort_tracker.py:126-141), and
  * the full lifecycle — (track_id, state, time_since_update, hits) for
    every live track.

Usage (TPU, ~1 min for 500 frames):
    python scripts/clip_parity.py [--frames N] [--conf 0.25]
        [--min_conf 0.3] [--dump tests/data/clip_dets.npz]
        [--report docs/CLIP_PARITY.md]

``--dump`` records the raw per-frame detector outputs so the CI test
(tests/test_clip_parity.py) can replay the tracker-level parity check
hardware-free without re-running the detector.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
REFERENCE_ROOT = "/root/reference"
CLIP = Path(REFERENCE_ROOT) / "assets" / "aicamera_test_clip.mp4"
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)


def ref_emitted(core, classes):
    """Reference facade output formatting (deepsort_tracker.py:126-141)."""
    out = []
    for t in core.tracks:
        if t.is_confirmed() and t.time_since_update == 0:
            x1, y1, w, h = t.to_tlwh()
            w, h = max(0, w), max(0, h)
            out.append((int(round(x1)), int(round(y1)),
                        int(round(x1 + w)), int(round(y1 + h)),
                        t.track_id, t.class_name, float(t.confidence)))
    return sorted(out, key=lambda r: r[4])


def ref_lifecycle(core):
    return sorted((t.track_id, int(t.state), t.time_since_update, t.hits)
                  for t in core.tracks)


def our_lifecycle(ds):
    st = ds.state
    active = np.asarray(st.active)
    return sorted(zip(np.asarray(st.track_id)[active].tolist(),
                      np.asarray(st.state)[active].tolist(),
                      np.asarray(st.tsu)[active].tolist(),
                      np.asarray(st.hits)[active].tolist()))


def run_parity(frames_bgr, detections, *, reid_weights, min_conf,
               max_tracks=None, progress=True, reid_dtype=None):
    """Drive both trackers with identical detections; return a report dict.

    ``detections`` is a list of (boxes_xyxy, scores, class_ids) per frame
    (raw detector outputs, pre tracker-filter).

    ``max_tracks`` sizes our fixed device track table. The reference's
    Python track list is unbounded; under a noisy high-churn detection
    stream (max_age=70 keeps missed tracks alive for 70 frames) the live
    population can exceed the production default of 128, at which point we
    drop new tentative tracks the reference still initiates — a documented
    capacity deviation, not a semantics divergence. The report carries
    ``peak_live_tracks`` so the capacity can be validated post hoc.
    """
    from aicamera_tpu import config
    from aicamera_tpu.tracker_api import DeepSORT
    from src.tracker.core.detection import Detection as RefDetection
    from src.tracker.core.tracker_core import TrackerCore

    ds = DeepSORT(reid_model_path=reid_weights,
                  min_detection_confidence=min_conf,
                  nn_budget=config.DEEPSORT_NN_BUDGET,
                  max_tracks=max_tracks or config.MAX_TRACKS,
                  capture_features=True, reid_dtype=reid_dtype)
    ref = TrackerCore(
        max_cosine_distance=config.DEEPSORT_MAX_DIST,
        nn_budget=config.DEEPSORT_NN_BUDGET,
        max_iou_distance=config.DEEPSORT_MAX_IOU_DISTANCE,
        max_age=config.DEEPSORT_MAX_AGE,
        n_init=config.DEEPSORT_N_INIT)

    mismatches = []
    ours_per_frame = []
    n_emitted = 0
    all_ids = set()
    det_total = 0
    peak_live = 0
    t0 = time.perf_counter()
    for fi, (frame, (boxes, scores, clss)) in enumerate(
            zip(frames_bgr, detections)):
        ours = sorted(ds.update(boxes, scores, clss, frame),
                      key=lambda r: r[4])
        ours_per_frame.append(ours)

        ref_dets = []
        for i in range(len(ds.last_conf)):
            cid = int(ds.last_class_id[i])
            name = config.CLASSES[cid] if 0 <= cid < len(config.CLASSES) \
                else "Unknown"
            feat = (np.asarray(ds.last_features[i], np.float32)
                    if bool(ds.last_has_feature[i]) else None)
            ref_dets.append(RefDetection(
                ds.last_tlwh[i].astype(np.float64),
                float(ds.last_conf[i]), name, feat))
        ref.predict()
        ref.update(ref_dets)
        refs = ref_emitted(ref, config.CLASSES)

        det_total += len(ref_dets)
        n_emitted += len(ours)
        all_ids.update(o[4] for o in ours)

        frame_bad = []
        if [o[4] for o in ours] != [r[4] for r in refs]:
            frame_bad.append(
                f"ids {[o[4] for o in ours]} vs ref {[r[4] for r in refs]}")
        else:
            for o, r in zip(ours, refs):
                if o[5] != r[5]:
                    frame_bad.append(f"id {o[4]} class {o[5]} vs {r[5]}")
                if abs(o[6] - r[6]) > 1e-5:
                    frame_bad.append(f"id {o[4]} conf {o[6]} vs {r[6]}")
                if max(abs(np.array(o[:4]) - np.array(r[:4]))) > 1:
                    frame_bad.append(f"id {o[4]} box {o[:4]} vs {r[:4]}")
        lo, lr = our_lifecycle(ds), ref_lifecycle(ref)
        peak_live = max(peak_live, len(lr))
        if lo != lr:
            so, sr = set(lo), set(lr)
            frame_bad.append(
                f"lifecycle ours-only {sorted(so - sr)[:6]} "
                f"ref-only {sorted(sr - so)[:6]} "
                f"(live {len(lo)} vs {len(lr)})")
        if frame_bad:
            mismatches.append((fi, frame_bad))
        if progress and (fi + 1) % 100 == 0:
            print(f"  frame {fi + 1}/{len(frames_bgr)}: "
                  f"{len(mismatches)} mismatched frames so far",
                  flush=True)
    dt = time.perf_counter() - t0
    return {
        "frames": len(frames_bgr),
        "detections_total": det_total,
        "detections_per_frame": det_total / max(len(frames_bgr), 1),
        "emitted_total": n_emitted,
        "unique_track_ids": len(all_ids),
        "mismatched_frames": len(mismatches),
        "mismatches": mismatches,
        "ours_per_frame": ours_per_frame,
        "peak_live_tracks": peak_live,
        "max_tracks": ds.params.max_tracks,
        "dropped_detections": int(ds.dropped_detections),
        "seconds": dt,
    }


def pipeline_check(frames_bgr, facade_per_frame, *, yolo_weights,
                   reid_weights, conf, min_conf, max_tracks=None,
                   chunk_size=96, detect_dtype=None,
                   preprocess_impl="auto", reid_dtype=None,
                   scan_bucket=32):
    # chunk_size 1 compiles the scan at K=1 — per-frame stepping in the
    # same program structure; isolates K-dependent compiled-arithmetic
    # drift (ULP-level f32 scheduling differences across programs)
    """Run the production chunked TrackingPipeline over the same frames and
    compare its emitted tracks against the facade's (== the reference's).

    Not an exact invariant by construction: the pipeline detects at chunk
    batch shape and embeds ReID crops at load-adaptive bucket shapes, so
    bf16 numerics can differ marginally from the facade's batch-1 detect /
    fixed-bucket embed. This measures how often that matters on real video
    with trained weights.
    """
    from aicamera_tpu import config
    from aicamera_tpu.core.state import TrackerParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    tp = TrackerParams(
        max_cosine_distance=config.DEEPSORT_MAX_DIST,
        nn_budget=config.DEEPSORT_NN_BUDGET,
        max_iou_distance=config.DEEPSORT_MAX_IOU_DISTANCE,
        max_age=config.DEEPSORT_MAX_AGE,
        n_init=config.DEEPSORT_N_INIT,
        max_tracks=max_tracks or config.MAX_TRACKS,
        max_detections=config.MAX_DETECTIONS,
        feature_dim=config.REID_FEATURE_DIM)
    pipe = TrackingPipeline(
        yolo_weights=yolo_weights, reid_weights=reid_weights,
        conf_threshold=conf, min_detection_confidence=min_conf,
        tracker_params=tp, chunk_size=chunk_size,
        detect_dtype=detect_dtype, preprocess_impl=preprocess_impl,
        reid_dtype=reid_dtype, scan_bucket=scan_bucket)
    id_same = box_same = 0
    rows_matched = rows_total = 0
    examples = []
    pipe.warm_up(frames_bgr[0].shape[:2])
    t0 = time.perf_counter()
    for fi, res in enumerate(pipe.process_frames(iter(frames_bgr))):
        pt = sorted(res.tracks, key=lambda r: r[4])
        ft = facade_per_frame[fi]
        ids_ok = [t[4] for t in pt] == [t[4] for t in ft]
        id_same += ids_ok
        boxes_ok = ids_ok and all(
            max(abs(np.array(p[:4]) - np.array(f[:4]))) <= 1
            for p, f in zip(pt, ft))
        box_same += boxes_ok
        # Row-level box agreement ignoring track IDs: greedy 1px matching
        # of emitted boxes. Separates "different detections survived NMS
        # at the chunk batch shape" (row mismatch) from "same physical
        # tracks, IDs diverged at an earlier tie-break" (rows match).
        unused = list(range(len(ft)))
        for p in pt:
            for j in unused:
                if max(abs(np.array(p[:4]) - np.array(ft[j][:4]))) <= 1:
                    rows_matched += 1
                    unused.remove(j)
                    break
        rows_total += max(len(pt), len(ft))
        if not ids_ok and len(examples) < 5:
            examples.append((fi, [t[4] for t in pt], [t[4] for t in ft]))
    wall = time.perf_counter() - t0
    n = len(facade_per_frame)
    return {"frames": n, "id_identical_frames": id_same,
            "box_identical_frames": box_same,
            "rows_matched": rows_matched, "rows_total": rows_total,
            "wall_fps": n / max(wall, 1e-9),
            "detect_dtype": detect_dtype or "bf16",
            "preprocess_impl": preprocess_impl,
            "reid_dtype": reid_dtype or "bf16",
            "scan_bucket": scan_bucket,
            "examples": examples}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", default=str(CLIP))
    ap.add_argument("--frames", type=int, default=0,
                    help="limit frame count (0 = all)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="instead of a video file, render N frames of the "
                         "synthetic world the checkpoints were trained on "
                         "(in-domain detection scores with real margins — "
                         "isolates how much of the pipeline/facade "
                         "divergence is the out-of-domain score-tie "
                         "artifact)")
    ap.add_argument("--conf", type=float, default=0.25,
                    help="detector confidence threshold")
    ap.add_argument("--min_conf", type=float, default=0.3,
                    help="tracker min detection confidence (prefilter)")
    ap.add_argument("--max_tracks", type=int, default=512,
                    help="device track-table capacity for the parity run "
                         "(must exceed the reference's peak live-track "
                         "population; the report records the peak)")
    ap.add_argument("--weights", default=str(
        ROOT / "models" / "detection" / "yolov8n_synthetic.msgpack"))
    ap.add_argument("--reid_weights", default=str(
        ROOT / "models" / "reid" / "deepsort_reid_synthetic.msgpack"))
    ap.add_argument("--dump", default="",
                    help="write raw per-frame detections to this .npz")
    ap.add_argument("--from_dump", default="",
                    help="load per-frame detections from a prior --dump "
                         ".npz instead of re-running the detector "
                         "(parity/pipeline passes only)")
    ap.add_argument("--report", default="",
                    help="write a markdown report to this path")
    ap.add_argument("--pipeline_check", action="store_true",
                    help="also run the chunked TrackingPipeline over the "
                         "same frames and measure agreement with the "
                         "facade/reference chain")
    ap.add_argument("--f32_detect", action="store_true",
                    help="run BOTH detect paths (the batch-1 facade pass "
                         "and the chunked pipeline) with the f32 detect "
                         "forward instead of bf16 — the batch-shape "
                         "numerics A/B: bf16 near-tied NMS scores flip "
                         "ordering between batch shapes; f32 scores are "
                         "stable. Compare the pipeline agreement and "
                         "wall FPS against the default run.")
    ap.add_argument("--f32_reid", action="store_true",
                    help="run BOTH embed paths (facade + pipeline) with "
                         "the f32 ReID forward: the facade embeds a "
                         "fixed per-frame crop bucket while the pipeline "
                         "fuses load-adaptive buckets across the chunk — "
                         "different batch shapes, so bf16 features "
                         "diverge in low bits and flip near-tied "
                         "appearance assignments.")
    ap.add_argument("--pipeline_chunk", type=int, default=96,
                    help="pipeline chunk size for the agreement pass "
                         "(1 = per-frame stepping; divergence-isolation "
                         "probe for chunk-size-dependent compiled "
                         "arithmetic)")
    ap.add_argument("--pipeline_scan_bucket", type=int, default=32,
                    help="capacity-bucketed scan size for the pipeline "
                         "arm (0 disables — divergence-isolation probe: "
                         "the bucketed scan transitions paths as live "
                         "tracks cross the bucket)")
    ap.add_argument("--pipeline_preprocess", default="auto",
                    choices=("auto", "xla", "pallas"),
                    help="preprocess implementation for the CHUNKED "
                         "pipeline arm. The batch-1 facade detect always "
                         "letterboxes via the XLA path, while the "
                         "pipeline defaults to the Pallas kernel on TPU "
                         "— and the two agree only within one uint8 LSB "
                         "(test_ops.py), a per-pixel input perturbation. "
                         "'xla' removes that confound so the remaining "
                         "disagreement is attributable to batch shape.")
    ap.add_argument("--json_out", default="",
                    help="append the run's metrics as one JSON line to "
                         "this file (the CI agreement floor reads it)")
    args = ap.parse_args()
    detect_dtype = "f32" if args.f32_detect else None
    reid_dtype = "f32" if args.f32_reid else None

    from aicamera_tpu.detector import YOLODetector

    if args.synthetic:
        from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

        world = TemporalWorld(WorldSpec(max_objects=10, presence=1.0),
                              seed=7, speed=3.0)
        frames = [world.step()[0] for _ in range(args.synthetic)]
        args.input = f"synthetic_world({args.synthetic} frames)"
        print(f"{len(frames)} synthetic in-domain frames rendered")
    else:
        import cv2

        cap = cv2.VideoCapture(args.input)
        frames = []
        while True:
            ok, f = cap.read()
            if not ok or (args.frames and len(frames) >= args.frames):
                break
            frames.append(f)
        cap.release()
        if not frames:
            sys.exit(f"no frames decoded from {args.input}")
        print(f"{len(frames)} frames from {args.input}")

    if args.from_dump:
        z = np.load(args.from_dump)
        cnt = z["counts"]
        detections = [(z["boxes"][i, :cnt[i]], z["scores"][i, :cnt[i]],
                       z["class_ids"][i, :cnt[i]].astype(np.int32))
                      for i in range(min(len(cnt), len(frames)))]
        frames = frames[:len(detections)]
        print(f"loaded {sum(len(d[1]) for d in detections)} raw detections "
              f"for {len(detections)} frames from {args.from_dump}")
    else:
        det = YOLODetector(engine_path=args.weights,
                           conf_threshold=args.conf,
                           detect_dtype=detect_dtype)
        detections = []
        t0 = time.perf_counter()
        for fi, f in enumerate(frames):
            boxes, scores, clss, _ = det.detect(f)
            detections.append(
                (np.asarray(boxes, np.float32).reshape(-1, 4),
                 np.asarray(scores, np.float32).reshape(-1),
                 np.asarray(clss).reshape(-1).astype(np.int32)))
            if (fi + 1) % 100 == 0:
                print(f"  detect {fi + 1}/{len(frames)}", flush=True)
        print(f"detect pass: {time.perf_counter() - t0:.1f}s, "
              f"{sum(len(d[1]) for d in detections)} raw detections")

    if args.dump:
        kmax = max(1, max(len(d[1]) for d in detections))
        n = len(detections)
        b = np.zeros((n, kmax, 4), np.float32)
        s = np.zeros((n, kmax), np.float32)
        c = np.zeros((n, kmax), np.int16)
        cnt = np.zeros((n,), np.int16)
        for i, (bb, ss, cc) in enumerate(detections):
            k = len(ss)
            cnt[i] = k
            b[i, :k], s[i, :k], c[i, :k] = bb, ss, cc
        out = Path(args.dump)
        out.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(out, boxes=b, scores=s, class_ids=c, counts=cnt,
                            conf_threshold=args.conf,
                            weights=str(Path(args.weights).name),
                            clip=str(args.input))
        print(f"dumped detections -> {out} "
              f"({out.stat().st_size / 1024:.0f} KiB)")

    print("tracker parity pass (ours vs reference TrackerCore)...")
    rep = run_parity(frames, detections,
                     reid_weights=args.reid_weights,
                     min_conf=args.min_conf,
                     max_tracks=args.max_tracks,
                     reid_dtype=reid_dtype)

    ok = rep["mismatched_frames"] == 0
    print(f"frames={rep['frames']} dets/frame="
          f"{rep['detections_per_frame']:.1f} emitted={rep['emitted_total']}"
          f" unique_ids={rep['unique_track_ids']} "
          f"peak_live={rep['peak_live_tracks']}/{rep['max_tracks']} "
          f"dropped={rep['dropped_detections']} "
          f"mismatched_frames={rep['mismatched_frames']} "
          f"({rep['seconds']:.1f}s)")
    for fi, bad in rep["mismatches"][:10]:
        print(f"  frame {fi}: " + "; ".join(bad))
    print("PARITY OK" if ok else "PARITY FAILED")

    pc = None
    if args.pipeline_check:
        print("pipeline agreement pass (chunked TrackingPipeline vs "
              "facade/reference)...")
        pc = pipeline_check(frames, rep["ours_per_frame"],
                            yolo_weights=args.weights,
                            reid_weights=args.reid_weights,
                            conf=args.conf, min_conf=args.min_conf,
                            max_tracks=args.max_tracks,
                            detect_dtype=detect_dtype,
                            preprocess_impl=args.pipeline_preprocess,
                            reid_dtype=reid_dtype,
                            scan_bucket=args.pipeline_scan_bucket,
                            chunk_size=args.pipeline_chunk)
        print(f"pipeline[{pc['detect_dtype']}]: "
              f"{pc['id_identical_frames']}/{pc['frames']} frames "
              f"with identical track-ID sequences, "
              f"{pc['box_identical_frames']} also box-identical (<=1px); "
              f"box rows matched ignoring IDs: {pc['rows_matched']}/"
              f"{pc['rows_total']} "
              f"({100 * pc['rows_matched'] / max(pc['rows_total'], 1):.1f}%); "
              f"pipeline wall {pc['wall_fps']:.0f} FPS")
        for fi, pids, fids in pc["examples"]:
            print(f"  frame {fi}: pipeline ids {pids} vs facade {fids}")

    if args.json_out:
        import json as _json
        line = {"clip": str(Path(args.input).name),
                "weights": str(Path(args.weights).name),
                "detect_dtype": detect_dtype or "bf16",
                "reid_dtype": reid_dtype or "bf16",
                "pipeline_preprocess": args.pipeline_preprocess,
                "scan_bucket": args.pipeline_scan_bucket,
                "pipeline_chunk": args.pipeline_chunk,
                "frames": rep["frames"],
                "mismatched_frames": rep["mismatched_frames"]}
        if pc is not None:
            line.update(
                id_identical_frames=pc["id_identical_frames"],
                box_identical_frames=pc["box_identical_frames"],
                rows_matched=pc["rows_matched"],
                rows_total=pc["rows_total"],
                row_agreement=round(
                    pc["rows_matched"] / max(pc["rows_total"], 1), 4),
                pipeline_wall_fps=round(pc["wall_fps"], 1))
        out = Path(args.json_out)
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "a") as f:
            f.write(_json.dumps(line) + "\n")
        print(f"metrics appended -> {out}")

    if args.report:
        path = Path(args.report)
        path.parent.mkdir(parents=True, exist_ok=True)
        lines = [
            "# Clip-scale track-ID parity vs the reference TrackerCore",
            "",
            f"Generated by `scripts/clip_parity.py` on "
            f"`{Path(args.input).name}`.",
            "",
            "Our full detect path (YOLOv8n, "
            f"`{Path(args.weights).name}`, conf {args.conf}) produced the "
            "detections; both trackers consumed identical post-filter "
            "detections and identical on-device appearance features "
            f"(`{Path(args.reid_weights).name}`).",
            "",
            f"| frames compared | {rep['frames']} |",
            "|---|---|",
            f"| detections / frame | {rep['detections_per_frame']:.2f} |",
            f"| emitted track rows | {rep['emitted_total']} |",
            f"| unique track IDs | {rep['unique_track_ids']} |",
            f"| peak live tracks | {rep['peak_live_tracks']} "
            f"(table capacity {rep['max_tracks']}) |",
            f"| detections dropped to capacity | "
            f"{rep['dropped_detections']} |",
            f"| mismatched frames | **{rep['mismatched_frames']}** |",
            f"| verdict | **{'PARITY OK' if ok else 'PARITY FAILED'}** |",
            "",
            "Per-frame checks: emitted set (confirmed & tsu==0, reference "
            "facade formatting deepsort_tracker.py:126-141 — IDs, class "
            "names, confidences, boxes within 1px) and full lifecycle "
            "state (track_id, state, time_since_update, hits) for every "
            "live track.",
        ]
        if pc is not None:
            lines += [
                "",
                "## Production chunked pipeline agreement",
                "",
                "The chunked `TrackingPipeline` (the bench/CLI path — "
                "96-frame fused device steps, load-adaptive ReID buckets) "
                "run over the same frames, compared per frame against the "
                "facade/reference chain above. Not an exact invariant by "
                "construction (batch-shape-dependent bf16 numerics in "
                "detect/embed), measured on real video:",
                "",
                f"| track-ID-identical frames | "
                f"**{pc['id_identical_frames']} / {pc['frames']}** |",
                "|---|---|",
                f"| also box-identical (<=1px) | "
                f"{pc['box_identical_frames']} |",
                f"| emitted box rows matched ignoring IDs (<=1px) | "
                f"**{100 * pc['rows_matched'] / max(pc['rows_total'], 1):.1f}%**"
                f" ({pc['rows_matched']} / {pc['rows_total']}) |",
                "",
                "Rows that match ignoring IDs are the same physical "
                "tracks whose ID labels diverged at an earlier bf16 "
                "tie-break. Unmatched rows stem from the chunk-batch "
                "detect admitting different NMS survivors than the "
                "facade's batch-1 detect (near-tied scores under bf16 "
                "flip ordering across batch shapes — the synthetic-"
                "trained checkpoint has no discriminative margin on real "
                "video), compounded by the diverged Kalman update "
                "histories that follow. The facade chain above, driven "
                "with *identical* detections, is the parity proof; this "
                "section measures how much batch-shape numerics move the "
                "production fused path away from batch-1 replay on a "
                "near-tie-dense detection stream.",
            ]
        if not ok:
            lines += ["", "## Mismatches (first 10)", ""]
            lines += [f"- frame {fi}: " + "; ".join(bad)
                      for fi, bad in rep["mismatches"][:10]]
        path.write_text("\n".join(lines) + "\n")
        print(f"report -> {path}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
