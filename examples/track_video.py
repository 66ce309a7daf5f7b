"""Frame-by-frame tracking with the reference-compatible facades.

The exact loop a user of the reference writes
(/root/reference/src/aicamera_tracker.py:169-240), against the same two
classes: ``YOLODetector.detect`` then ``DeepSORT.update``.

    python examples/track_video.py [--cpu] [--input clip.mp4] [--frames 32]
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
    from aicamera_tpu.tracker_api import DeepSORT

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
    tracker = DeepSORT()  # reference defaults: MAX_DIST=0.2, MAX_AGE=70, ...

    for i, frame in enumerate(frames()):
        boxes, scores, class_ids, keep = det.detect(frame)
        tracks = tracker.update(boxes[keep], scores[keep], class_ids[keep],
                                frame)
        print(f"frame {i:3d}: {len(keep)} detections, "
              f"{len(tracks)} confirmed tracks")
        for x1, y1, x2, y2, tid, cls, conf in tracks:
            print(f"    ID:{tid} {cls} {conf:.2f} ({x1},{y1},{x2},{y2})")


if __name__ == "__main__":
    main()
