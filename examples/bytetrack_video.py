"""ByteTrack: the alternative tracker core (motion-only, no ReID model).

The reference lists ByteTrack integration under "Future Enhancements"
(/root/reference/README.md); this framework ships it as a drop-in swap for
DeepSORT with the same ``update`` contract. Two usage modes:

1. Facade loop (below): ``YOLODetector.detect`` at a LOW confidence
   threshold — ByteTrack's second association stage recovers occluded
   objects from the low-score boxes other pipelines throw away — then
   ``ByteTrack.update``.
2. Fused pipeline: ``TrackingPipeline(tracker="bytetrack")`` or CLI
   ``--tracker bytetrack`` (the ReID crop/embed stage disappears from the
   device program entirely).

    python examples/bytetrack_video.py [--cpu] [--input clip.mp4] [--frames 32]
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

    from aicamera_tpu.bytetrack_api import ByteTrack
    from aicamera_tpu.detector import YOLODetector

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

    # the detector must emit low-score boxes for BYTE's second stage:
    # conf_threshold at the tracker's low floor (0.1), not the usual 0.3
    det = YOLODetector(conf_threshold=0.1)
    tracker = ByteTrack()  # track_thresh=0.5, match_thresh=0.8, buffer=30

    for i, frame in enumerate(frames()):
        boxes, scores, class_ids, keep = det.detect(frame)
        tracks = tracker.update(boxes[keep], scores[keep], class_ids[keep],
                                frame)
        print(f"frame {i:3d}: {len(keep)} detections, "
              f"{len(tracks)} active tracks")
        for x1, y1, x2, y2, tid, cls, conf in tracks:
            print(f"    ID:{tid} {cls} {conf:.2f} ({x1},{y1},{x2},{y2})")


if __name__ == "__main__":
    main()
