"""OC-SORT: observation-centric motion tracking (no ReID model).

The reference lists OC-SORT integration under "Future Enhancements"
(/root/reference/README.md); this framework ships it as a drop-in swap for
DeepSORT with the same ``update`` contract. Association is IoU plus a
velocity-direction momentum bonus (OCM); lost tracks recover by their
last observation box (OCR) and the Kalman state replays the missed
trajectory on revival (ORU). Two usage modes:

1. Facade loop (below): ``YOLODetector.detect`` then ``OCSort.update``.
   OC-SORT gates its input strictly at ``det_thresh`` (0.6 by default) —
   run the detector at or below that so the tracker sees every box it
   would accept.
2. Fused pipeline: ``TrackingPipeline(tracker="ocsort")`` or CLI
   ``--tracker ocsort`` (the ReID crop/embed stage disappears from the
   device program entirely).

    python examples/ocsort_video.py [--cpu] [--input clip.mp4] [--frames 32]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples._common import parse_args, demo_frame  # noqa: E402


def main():
    args = parse_args(__doc__, extra=lambda ap: (
        ap.add_argument("--input", help="video file (default: synthetic)"),
        ap.add_argument("--frames", type=int, default=16),
    ))

    from aicamera_tpu.detector import YOLODetector
    from aicamera_tpu.ocsort_api import OCSort

    def frames():
        if args.input:
            import cv2
            cap = cv2.VideoCapture(args.input)
            try:
                for _ in range(args.frames):
                    ok, f = cap.read()
                    if not ok:
                        return
                    yield f
            finally:
                cap.release()
        else:
            for i in range(args.frames):
                yield demo_frame(seed=i)

    det = YOLODetector(conf_threshold=0.3)
    tracker = OCSort()  # det_thresh=0.6, iou_threshold=0.3, min_hits=3

    for i, frame in enumerate(frames()):
        boxes, scores, class_ids, keep = det.detect(frame)
        tracks = tracker.update(boxes[keep], scores[keep], class_ids[keep],
                                frame)
        print(f"frame {i:3d}: {len(keep)} detections, "
              f"{len(tracks)} emitted tracks")
        for x1, y1, x2, y2, tid, cls, conf in tracks:
            print(f"    ID:{tid} {cls} {conf:.2f} ({x1},{y1},{x2},{y2})")


if __name__ == "__main__":
    main()
