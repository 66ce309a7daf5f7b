"""YOLODetector facade on a single frame.

Mirrors the reference's detector contract
(/root/reference/src/detector/yolo_detector.py:68): BGR uint8 frame in,
``(boxes_xyxy, scores, class_ids, filtered_indices)`` in original frame
coordinates out.

    python examples/detect_image.py [--cpu] [--image path.jpg]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples._common import parse_args, demo_frame  # noqa: E402


def main():
    args = parse_args(__doc__, extra=lambda ap: (
        ap.add_argument("--image", help="image file (default: synthetic)"),
        ap.add_argument("--weights", help="msgpack/ONNX detector weights"),
    ))

    from aicamera_tpu.detector import YOLODetector

    if args.image:
        import cv2
        frame = cv2.imread(args.image)
        assert frame is not None, f"could not read {args.image}"
    else:
        frame = demo_frame()

    det = YOLODetector(engine_path=args.weights, conf_threshold=0.3)
    boxes, scores, class_ids, keep = det.detect(frame)
    print(f"{len(keep)} detections above threshold")
    for b, s, c in zip(boxes[keep], scores[keep], class_ids[keep]):
        print(f"  class={int(c):2d} conf={float(s):.3f} "
              f"box=({b[0]:.0f},{b[1]:.0f},{b[2]:.0f},{b[3]:.0f})")
    if not args.weights:
        print("(random weights — boxes are meaningless; pass --weights or "
              "run scripts/train_synthetic.py)")


if __name__ == "__main__":
    main()
