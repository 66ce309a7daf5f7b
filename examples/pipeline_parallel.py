"""Pipeline-parallel detector: backbone/neck/head stages across devices.

The detector's three natural stages are committed to separate devices and
microbatches stream through them GPipe-style — JAX async dispatch
overlaps stage k of microbatch i with stage k+1 of microbatch i-1, and
the inter-stage activation hops ride ICI on a real TPU mesh. Use it when
a large variant's weights + activations outgrow one chip's HBM, or to
compose with stream parallelism. The results are bitwise-identical to the
same stage split on one device, and feed the fixed-shape decode+NMS
unchanged.

    python examples/pipeline_parallel.py --cpu [--batch 8]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples._common import parse_args, demo_frame  # noqa: E402


def main():
    args = parse_args(__doc__, extra=lambda ap: (
        ap.add_argument("--batch", type=int, default=8),
        ap.add_argument("--variant", default="n"),
    ))

    import numpy as np
    import jax
    import jax.numpy as jnp
    from aicamera_tpu.models import YOLOv8
    from aicamera_tpu.ops.nms import fused_decode_nms
    from aicamera_tpu.ops.preprocess import letterbox_spec, preprocess_yolo
    from aicamera_tpu.parallel import PipelineParallelDetector
    from aicamera_tpu.runtime.params import resolve_yolo_params

    devs = jax.devices()[:3]
    print(f"stages backbone/neck/head on {[str(d) for d in devs]}")

    hw, input_hw = (288, 512), (256, 256)
    model, params = resolve_yolo_params(args.variant)
    pp = PipelineParallelDetector(args.variant, devices=devs)
    pp.place_params(params)

    frames = np.stack([demo_frame(hw, seed=s) for s in range(args.batch)])
    spec = letterbox_spec(hw, input_hw)
    x = jax.vmap(lambda f: preprocess_yolo(f, spec,
                                           out_dtype=jnp.float32)[0])(
        jnp.asarray(frames))

    levels = pp.forward(x, microbatch=max(1, args.batch // 4))
    num, boxes, scores, labels = fused_decode_nms(
        levels, score_threshold=0.25, iou_threshold=0.45,
        top_k=128, max_det=32)
    print(f"per-level outputs: "
          f"{[tuple(map(int, r.shape)) for r, _ in levels]}")
    print(f"detections per frame: {np.asarray(num).tolist()}")


if __name__ == "__main__":
    main()
