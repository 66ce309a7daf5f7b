"""Int8 (W8A8) quantized model paths + chunk-granular streaming.

Two opt-in precision notches past the reference's ``--fp16`` engines
(``export_trt_engines.sh:37``):

* ``reid_quant="int8"`` — dynamic per-crop activation scales,
  per-channel int8 weights (``models/quant.py``);
* ``yolo_quant="int8"`` — static calibration over deterministic
  synthetic scenes, activation scales folded into the kernels so
  activations stay int8 between conv fusions (``models/quant_yolo.py``).

Quality is pinned by oracle tests and benchmark configs 27/28 (identical
MOTA/HOTA; AP50 within noise). NOTE: on the current XLA conv lowering
int8 measures *slower* than bf16 (docs/ROOFLINE.md), so these stay
opt-in until the compiler uses the MXU's 2x int8 MAC rate for convs.

Also shows ``process_chunks`` — chunk-granular streaming (one Python
crossing per device dispatch, the CLI's ``--native_io`` fast path).

    python examples/quantized_pipeline.py [--cpu] [--frames 8]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples._common import parse_args, demo_frame  # noqa: E402


def main():
    args = parse_args(__doc__, extra=lambda ap: (
        ap.add_argument("--frames", type=int, default=8),
    ))

    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    # small input keeps the CPU demo quick; drop input_shape for 640x640
    pipe = TrackingPipeline(chunk_size=4, input_shape=(256, 256),
                            reid_quant="int8", yolo_quant="int8")
    print(f"reid_quant={pipe.reid_quant}  yolo_quant={pipe.yolo_quant}  "
          f"(detector calibrated on synthetic scenes at init)")

    frames = np.stack([demo_frame(seed=i) for i in range(args.frames)])

    def chunks():  # e.g. NativeVideoReader.read_chunk(4) in production
        for i in range(0, len(frames), 4):
            yield frames[i:i + 4]

    for res in pipe.process_chunks(chunks()):
        print(f"frame {res.frame_index}: {len(res.det_boxes)} detections, "
              f"{len(res.tracks)} tracks")
    print("ok")


if __name__ == "__main__":
    main()
