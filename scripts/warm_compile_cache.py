"""AOT-build analog of the reference's trtexec step.

The reference compiles ONNX to TensorRT engines once, offline
(``scripts/export_trt_engines.sh``: yolov8n fixed 1x3x640x640 fp16, ReID
dynamic batch up to 8). The XLA equivalent: import the ONNX weights into
the Flax models (cached as msgpack) and populate JAX's persistent
compilation cache for the production step shapes, so every later process
start skips compilation entirely.

Usage: python scripts/warm_compile_cache.py [--frame_h 540 --frame_w 960]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame_h", type=int, default=540)
    ap.add_argument("--frame_w", type=int, default=960)
    ap.add_argument("--chunk_sizes", type=int, nargs="+", default=[1, 8, 16])
    ap.add_argument("--variant", type=str, default="n")
    args = ap.parse_args()

    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    pipe = TrackingPipeline(variant=args.variant)
    for k in args.chunk_sizes:
        t0 = time.perf_counter()
        pipe.warm_up((args.frame_h, args.frame_w), chunk_size=k)
        print(f"chunk={k}: compiled+warmed in {time.perf_counter()-t0:.1f}s")
    print("XLA persistent cache is hot; subsequent starts compile from disk.")


if __name__ == "__main__":
    main()
