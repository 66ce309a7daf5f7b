#!/usr/bin/env python
"""Export serialized ``.xlae`` inference engines — the trtexec analog.

The reference AOT-compiles its ONNX models into self-contained TensorRT
``.engine`` files (``/root/reference/scripts/export_trt_engines.sh``): YOLO
fixed at 1x3x640x640 (:26-28), ReID with a dynamic-batch profile
(:32-34). This script is the TPU-native counterpart: it bakes the resolved
weights, letterbox spec and thresholds into portable StableHLO artifacts
via ``jax.export`` that ``YOLODetector(engine_path=...)`` /
``ReIDModel(engine_path=...)`` deserialize with no weight files present.

Usage:
    python scripts/export_engines.py [--out_dir models/engines]
        [--frame_hw 540x960 ...] [--variant n] [--input_size 640]
        [--skip_yolo] [--skip_reid]

Notes:
    - The detect engine is fixed per SOURCE frame shape (the un-letterbox
      transform is baked), exactly like the reference's fixed-shape YOLO
      engine; pass --frame_hw more than once for multiple shapes.
    - The ReID engine exports a symbolic batch axis: any concrete batch
      runs, compiling once per size (TRT dynamic-batch UX without the
      max-8 ceiling).
    - Artifacts embed lowerings for both 'cpu' and 'tpu', so engines
      exported here also load on the hardware-free test backend.
    - The compute dtype inside the artifact follows the EXPORTING
      backend's policy (bf16 on TPU, f32 on CPU) — export on the backend
      you will serve on, like building a TRT engine on the target GPU.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out_dir", type=str, default="models/engines")
    ap.add_argument("--frame_hw", action="append", default=None,
                    help="source frame HxW (repeatable); default 540x960 "
                         "(the benchmark clip)")
    ap.add_argument("--variant", type=str, default="n",
                    choices=list("nsmlx"))
    ap.add_argument("--input_size", type=int, default=640,
                    help="square letterbox target (reference: 640)")
    ap.add_argument("--conf_thresh", type=float, default=None)
    ap.add_argument("--skip_yolo", action="store_true")
    ap.add_argument("--skip_reid", action="store_true")
    args = ap.parse_args()

    out_dir = Path(args.out_dir)
    frame_hws = []
    for s in (args.frame_hw or ["540x960"]):
        h, w = s.lower().split("x")
        frame_hws.append((int(h), int(w)))

    from aicamera_tpu import config
    from aicamera_tpu.detector import YOLODetector
    from aicamera_tpu.tracker_api import ReIDModel

    if not args.skip_yolo:
        det = YOLODetector(
            input_shape=(args.input_size, args.input_size),
            conf_threshold=(args.conf_thresh
                            if args.conf_thresh is not None
                            else config.YOLO_CONF_THRESHOLD),
            variant=args.variant)
        for hw in frame_hws:
            path = out_dir / (f"yolov8{args.variant}_{args.input_size}"
                              f"_frame{hw[0]}x{hw[1]}.xlae")
            det.export_engine(hw, path)
            print(f"wrote {path} ({path.stat().st_size / 1e6:.1f} MB)")

    if not args.skip_reid:
        reid = ReIDModel()
        path = out_dir / "reid_dynamic.xlae"
        reid.export_engine(path)
        print(f"wrote {path} ({path.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
