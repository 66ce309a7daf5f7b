"""AICamera-TPU CLI: real-time object detection + tracking on video.

Flag-compatible with the reference CLI (``src/aicamera_tracker.py:20-67``):
``--input, --webcam_id, --output_dir, --output_filename, --show_display,
--no_save, --conf_thresh, --device`` plus ``--yolo_weights/--reid_weights``
(the analog of ``--yolo_engine/--reid_engine``) and TPU-specific knobs
(``--chunk_size, --variant, --max_frames``).

Run: ``python -m aicamera_tpu.cli --input video.mp4``
"""

from __future__ import annotations

import argparse
import contextlib
import time
from datetime import datetime
from pathlib import Path

import numpy as np

from . import config
from .utils import visualization
from .utils.video_io import VideoReader, VideoWriter


def parse_arguments(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="AICamera-TPU: Real-time Object Detection & Tracking "
                    "(JAX/XLA on TPU)")
    parser.add_argument("--input", type=str, default=None,
                        help="Path to input video file. If None, webcam.")
    parser.add_argument("--webcam_id", type=int, default=0,
                        help="Webcam ID used when --input is not given.")
    parser.add_argument("--output_dir", type=str, default="outputs",
                        help="Directory for the output video.")
    parser.add_argument("--output_filename", type=str, default=None,
                        help="Output video filename (auto-generated if None).")
    parser.add_argument("--show_display", action="store_true",
                        help="Show processed frames in a window.")
    parser.add_argument("--no_save", action="store_true",
                        help="Do not save the output video.")
    parser.add_argument("--yolo_weights", "--yolo_engine", type=str,
                        default=None, dest="yolo_weights",
                        help="YOLO weights (.msgpack or .onnx).")
    parser.add_argument("--reid_weights", "--reid_engine", type=str,
                        default=None, dest="reid_weights",
                        help="ReID weights (.msgpack or .onnx).")
    parser.add_argument("--conf_thresh", type=float,
                        default=config.YOLO_CONF_THRESHOLD,
                        help="Confidence threshold for YOLO detections.")
    parser.add_argument("--device", type=str, default="tpu",
                        help="Backend: 'tpu' (default) or 'cpu'.")
    parser.add_argument("--variant", type=str, default="n",
                        choices=("n", "s", "m", "l", "x"),
                        help="YOLOv8 variant.")
    parser.add_argument("--tracker", type=str, default="deepsort",
                        choices=("deepsort", "strongsort", "bytetrack",
                                 "botsort", "ocsort", "deepocsort"),
                        help="Tracking algorithm: 'deepsort' (reference "
                             "parity, appearance + motion), 'strongsort' "
                             "(DeepSORT + the StrongSORT preset: EMA "
                             "appearance bank, NSA Kalman, gmc=affine "
                             "unless --gmc overrides), 'bytetrack' "
                             "(motion-only two-pass association over high "
                             "AND low score boxes; no ReID stage), "
                             "'botsort' (ByteTrack + BoT-SORT appearance "
                             "fusion: ReID embeddings fold into stages "
                             "1/3 as min(IoU, masked cosine)) or "
                             "'ocsort' (observation-centric motion "
                             "tracking: OCM momentum bonus, last-"
                             "observation recovery, re-update on revival; "
                             "no ReID stage) or 'deepocsort' (OC-SORT + "
                             "Deep OC-SORT's adaptively weighted ReID "
                             "appearance fusion and dynamic-alpha EMA "
                             "banks; add --gmc affine for the paper's "
                             "full stack).")
    parser.add_argument("--gallery_strategy", type=str, default="fifo",
                        choices=("fifo", "ema"),
                        help="DeepSORT appearance memory: 'fifo' ring of "
                             "raw features (reference parity) or 'ema' — "
                             "one StrongSORT-style exponential-moving-"
                             "average embedding per track (cheaper, more "
                             "drift-robust on long occlusions).")
    parser.add_argument("--ema_alpha", type=float, default=0.9,
                        help="EMA blend factor for --gallery_strategy ema "
                             "(higher = slower-moving appearance bank).")
    parser.add_argument("--nsa", action="store_true",
                        help="Noise-scale-adaptive Kalman updates "
                             "(StrongSORT): scale measurement noise by "
                             "(1 - detection confidence) so confident "
                             "detections correct tracks harder. DeepSORT "
                             "tracker only.")
    parser.add_argument("--gmc", type=str, default=None,
                        choices=("off", "affine", "translation"),
                        help="Camera-motion compensation (any tracker): "
                             "estimate the inter-frame camera motion on-"
                             "device (block phase correlation) and warp "
                             "track states before association. Use for "
                             "panning/zooming (PTZ, vehicle-mounted) "
                             "cameras; 'off' = reference static-camera "
                             "behavior. Default: off ('affine' when "
                             "--tracker strongsort).")
    parser.add_argument("--reid_quant", type=str, default=None,
                        choices=("none", "int8"),
                        help="ReID embedder precision: 'int8' runs the "
                             "W8A8 post-training-quantized embed stage "
                             "(per-channel int8 weights, per-crop dynamic "
                             "activation scales, int32 MXU accumulation) "
                             "— the notch past the reference's --fp16 "
                             "engines. Default: bf16.")
    parser.add_argument("--yolo_quant", type=str, default=None,
                        choices=("none", "int8"),
                        help="Detector precision: 'int8' runs the static-"
                             "calibrated W8A8 detector twin (activations "
                             "stored int8 between conv fusions — the "
                             "forward is HBM-bound). Calibrates once at "
                             "startup on synthetic scenes. Default: bf16.")
    parser.add_argument("--detect_dtype", type=str, default=None,
                        choices=("bf16", "f32"),
                        help="Detect-forward precision: default bf16 "
                             "(TPU compute dtype); 'f32' makes NMS "
                             "scores batch-shape-stable (exact agreement "
                             "with batch-1 detection) at ~2x detect "
                             "cost — for parity-critical runs.")
    parser.add_argument("--reid_dtype", type=str, default=None,
                        choices=("bf16", "f32"),
                        help="ReID-embed precision: 'f32' makes features "
                             "stable across embed batch shapes (the "
                             "other half of the parity mode with "
                             "--detect_dtype f32).")
    parser.add_argument("--input_shape", type=int, default=None,
                        help="Detector input size (square; default "
                             f"{config.YOLO_INPUT_SHAPE[0]}).")
    parser.add_argument("--auto_input", action="store_true",
                        help="Letterbox 'auto' mode: convolve the "
                             "minimum stride-32 rectangle instead of the "
                             "full square canvas (skips the padding rows; "
                             "faster on wide sources, detections can "
                             "differ marginally at the canvas border).")
    parser.add_argument("--chunk_size", type=int, default=8,
                        help="Frames per fused device step (throughput knob; "
                             "1 = lowest latency).")
    parser.add_argument("--max_frames", type=int, default=None,
                        help="Stop after this many frames.")
    parser.add_argument("--native_io", action="store_true",
                        help="Decode with the native C++ reader "
                             "(native/video_reader.cpp: GIL-free decode "
                             "thread + chunk-granular drains). Falls back "
                             "to the Python threaded reader if the native "
                             "library is unavailable.")
    parser.add_argument("--draw_detections", action="store_true",
                        help="Also draw raw detections under the tracks.")
    parser.add_argument("--profile", action="store_true",
                        help="Print a per-stage timing breakdown at exit.")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Path for periodic tracker-state snapshots "
                             "(msgpack; written atomically).")
    parser.add_argument("--checkpoint_interval", type=int, default=500,
                        help="Frames between snapshots when --checkpoint "
                             "is set.")
    parser.add_argument("--resume", type=str, default=None,
                        help="Resume tracker state from a snapshot file "
                             "(track ids continue where they left off).")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_arguments(argv)
    if args.device.lower() == "cpu":
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        # The axon TPU plugin overrides the env var; the config update is
        # the reliable switch. Without it --device cpu silently ran on the
        # TPU (and could deadlock against another TPU-attached process).
        import jax
        jax.config.update("jax_platforms", "cpu")

    # import after the backend choice is settled
    from .runtime.pipeline import TrackingPipeline

    # --- flag validation (before any video/pipeline work) ----------------------
    if args.gallery_strategy == "ema" and args.tracker != "deepsort":
        # fail loudly rather than silently running motion-only tracking
        # while the user believes the EMA appearance bank is active
        raise SystemExit(
            f"--gallery_strategy ema requires --tracker deepsort (the "
            f"motion-only '{args.tracker}' core has no appearance gallery)")
    if args.nsa and args.tracker != "deepsort":
        raise SystemExit(
            f"--nsa requires --tracker deepsort (the motion-only "
            f"'{args.tracker}' core takes fixed-noise KF updates)")

    # --- video input ----------------------------------------------------------
    source = args.input if args.input else args.webcam_id
    reader = None
    if args.native_io:
        from .native import video_available
        if video_available():
            from .utils.video_io import NativeVideoReader
            reader = NativeVideoReader(source, max_frames=args.max_frames)
            print("Using native C++ video decoder")
        else:
            print("WARNING: --native_io requested but the native video "
                  "decoder is unavailable; using the Python reader")
    if reader is None:
        reader = VideoReader(source, max_frames=args.max_frames)
    source_name = (Path(args.input).stem if args.input
                   else f"webcam{args.webcam_id}")
    print(f"Input: {source_name} ({reader.width}x{reader.height} @ "
          f"{reader.fps:.1f} fps, {reader.frame_count or '?'} frames)")

    # webcam / display: chunk of 1 keeps latency at one frame
    chunk = 1 if (reader.is_webcam or args.show_display) else args.chunk_size

    # --- pipeline --------------------------------------------------------------
    print("Initializing TPU tracking pipeline...")
    extra = {}
    if args.input_shape:
        extra["input_shape"] = (args.input_shape, args.input_shape)
    if args.tracker == "deepsort" and args.gallery_strategy == "ema":
        from .core.state import TrackerParams
        extra["tracker_params"] = TrackerParams(
            max_cosine_distance=config.DEEPSORT_MAX_DIST,
            nn_budget=1,  # EMA bank occupies one gallery slot
            max_iou_distance=config.DEEPSORT_MAX_IOU_DISTANCE,
            max_age=config.DEEPSORT_MAX_AGE,
            n_init=config.DEEPSORT_N_INIT,
            max_tracks=config.MAX_TRACKS,
            max_detections=config.MAX_DETECTIONS,
            feature_dim=config.REID_FEATURE_DIM,
            ema_alpha=args.ema_alpha,
            nsa=args.nsa,
        )
    elif args.nsa:
        extra["nsa"] = True
    pipeline = TrackingPipeline(
        variant=args.variant,
        conf_threshold=args.conf_thresh,
        yolo_weights=args.yolo_weights,
        reid_weights=args.reid_weights,
        chunk_size=chunk,
        letterbox_auto=args.auto_input,
        tracker=args.tracker,
        gmc=args.gmc,
        reid_quant=(None if args.reid_quant in (None, "none")
                    else args.reid_quant),
        yolo_quant=(None if args.yolo_quant in (None, "none")
                    else args.yolo_quant),
        detect_dtype=args.detect_dtype,
        reid_dtype=args.reid_dtype,
        **extra,
    )
    print("Compiling fused detect+track step (cached after first run)...")
    secs = pipeline.warm_up((reader.height, reader.width))
    print(f"  ready in {secs:.1f}s")

    # --- tracker-state checkpointing (streaming snapshots / resume) -------------
    if args.resume:
        from .runtime.checkpoint import load_state
        resume_params = {"bytetrack": pipeline.bytetrack_params,
                         "botsort": pipeline.bytetrack_params,
                         "ocsort": pipeline.ocsort_params,
                         "deepocsort": pipeline.ocsort_params,
                         }.get(pipeline.tracker_kind,
                               pipeline.tracker_params)
        pipeline.state = load_state(args.resume, resume_params)
        print(f"Resumed tracker state from {args.resume}")
    ckpt_path = Path(args.checkpoint) if args.checkpoint else None
    if ckpt_path:
        from .runtime.checkpoint import save_state

    # --- video output -----------------------------------------------------------
    writer = None
    if not args.no_save:
        name = args.output_filename or (
            f"{source_name}_tracked_{datetime.now():%Y%m%d_%H%M%S}.mp4")
        writer = VideoWriter(str(Path(args.output_dir) / name),
                             reader.fps or config.DEFAULT_OUTPUT_FPS,
                             (reader.height, reader.width))
        print(f"Saving to: {writer.path}")

    show = args.show_display
    if show:
        import cv2
        cv2.namedWindow("AICamera-TPU", cv2.WINDOW_NORMAL)

    # keep frames around for drawing (results arrive one chunk behind)
    frame_store: dict[int, np.ndarray] = {}

    def indexed_frames():
        for i, f in enumerate(reader.frames()):
            frame_store[i] = f
            yield f

    # headless native-IO fast path: drain the C++ decoder in whole chunks
    # (one Python crossing per device dispatch); frames are only kept
    # per-frame when something draws them
    use_chunked = (args.native_io and hasattr(reader, "chunks")
                   and writer is None and not show)

    from .runtime.profiler import StageTimer
    timer = StageTimer() if args.profile else None

    n_frames = 0
    n_tracks_total = 0
    t_start = time.perf_counter()
    t_compute = 0.0
    try:
        t0 = time.perf_counter()
        result_iter = (pipeline.process_chunks(reader.chunks(chunk))
                       if use_chunked
                       else pipeline.process_frames(indexed_frames()))
        for result in result_iter:
            dt = time.perf_counter() - t0
            t_compute += dt
            if timer:
                timer.add("detect+track", dt)
            frame = frame_store.pop(result.frame_index, None)
            n_frames += 1
            n_tracks_total += len(result.tracks)

            # per-frame presentation errors skip the frame but keep the
            # pipeline alive (reference aicamera_tracker.py:181-198)
            try:
                if writer is not None or show:
                    vis = frame
                    if args.draw_detections:
                        vis = visualization.draw_detections(
                            vis, result.det_boxes, result.det_scores,
                            result.det_labels)
                    vis = visualization.draw_tracks(vis, result.tracks)
                    fps_now = n_frames / max(t_compute, 1e-9)
                    vis = visualization.draw_info_panel(vis, [
                        "AICamera-TPU",
                        f"Input: {source_name}",
                        f"FPS: {fps_now:.1f}",
                        f"Tracks: {len(result.tracks)}",
                    ])
                    with (timer.stage("draw+write") if timer
                          else contextlib.nullcontext()):
                        if writer is not None:
                            writer.write(vis)
                        if show:
                            import cv2
                            cv2.imshow("AICamera-TPU", vis)
                            if cv2.waitKey(1) & 0xFF == ord("q"):
                                break
            except Exception as e:  # noqa: BLE001
                print(f"Warning: frame {result.frame_index} "
                      f"presentation error ({e}); continuing.")
            if n_frames % 100 == 0:
                print(f"  processed {n_frames} frames "
                      f"({n_frames / max(t_compute, 1e-9):.1f} FPS)")
            if ckpt_path and n_frames % max(args.checkpoint_interval, 1) == 0:
                with (timer.stage("checkpoint") if timer
                      else contextlib.nullcontext()):
                    save_state(ckpt_path, pipeline.state)
            t0 = time.perf_counter()
    except KeyboardInterrupt:
        print("\nInterrupted — shutting down cleanly.")
    finally:
        if ckpt_path and n_frames:
            save_state(ckpt_path, pipeline.state)
            print(f"Final tracker state saved to {ckpt_path}")
        reader.release()
        if writer is not None:
            writer.release()
        if show:
            import cv2
            cv2.destroyAllWindows()

    wall = time.perf_counter() - t_start
    print("-" * 60)
    print(f"Processed {n_frames} frames in {wall:.2f}s wall "
          f"({n_frames / max(wall, 1e-9):.1f} FPS incl. decode+draw; "
          f"{n_frames / max(t_compute, 1e-9):.1f} FPS detect+track)")
    print(f"Average tracks per frame: "
          f"{n_tracks_total / max(n_frames, 1):.1f}")
    if timer:
        print(timer.report())


if __name__ == "__main__":
    main()
