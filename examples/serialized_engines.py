"""Serialized ``.xlae`` engines: export once, load anywhere (trtexec UX).

The reference builds self-contained TensorRT ``.engine`` files
(/root/reference/scripts/export_trt_engines.sh) that its runtime
deserializes without the ONNX files present (trt_engine.py:45-60). The
TPU-native analog is ``jax.export`` StableHLO artifacts: weights,
letterbox spec and thresholds baked in as constants; the ReID artifact
carries a symbolic (dynamic) batch axis like the reference engine's
dynamic-batch profile.

    python examples/serialized_engines.py [--cpu]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples._common import parse_args, demo_frame  # noqa: E402


def main():
    parse_args(__doc__)

    import numpy as np
    from aicamera_tpu.detector import YOLODetector
    from aicamera_tpu.tracker_api import DeepSORT, ReIDModel

    frame = demo_frame(hw=(270, 480))
    out_dir = Path(tempfile.mkdtemp(prefix="aicam_engines_"))

    # --- export: bake the fused detect step + the dynamic-batch embedder
    det = YOLODetector(input_shape=(320, 320))
    yolo_path = det.export_engine(frame.shape[:2],
                                  out_dir / "yolov8n_320.xlae")
    reid_path = ReIDModel().export_engine(out_dir / "reid_dynamic.xlae")
    for p in (yolo_path, reid_path):
        print(f"exported {p} ({p.stat().st_size / 1e6:.1f} MB)")

    # --- load: no weight files, no model resolution — artifacts only
    det2 = YOLODetector(engine_path=str(yolo_path))
    eng = det2.get_engine(frame.shape[:2])
    print("engine I/O:", eng.get_input_details(),
          "->", [o.shape for o in eng.get_output_details()])
    boxes, scores, cls, idx = det2.detect(frame)
    print(f"detect via serialized engine: {len(boxes)} boxes")

    ds = DeepSORT(reid_model_path=str(reid_path), n_init=2)
    for k in range(3):
        tracks = ds.update(boxes + 2 * k, scores, cls, frame)
    print(f"tracked via serialized ReID engine: {len(tracks)} confirmed "
          f"tracks after 3 frames")

    # parity against the weight-based path
    b2, s2, c2, i2 = det.detect(frame)
    assert np.array_equal(boxes, b2) and np.array_equal(scores, s2)
    print("serialized engine output == weight-based output (bitwise)")


if __name__ == "__main__":
    main()
