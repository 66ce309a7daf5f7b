"""High-throughput chunked pipeline with checkpoint/resume.

``TrackingPipeline`` fuses preprocess -> detect -> NMS -> crops -> ReID ->
associate -> track into one XLA program per K frames; this is what
``bench.py`` and the CLI run. Tracker state is a pytree that can be
snapshotted mid-stream and restored later (capability beyond the
reference).

    python examples/fused_pipeline.py [--cpu] [--frames 24] [--chunk 8]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples._common import parse_args, demo_frame  # noqa: E402


def main():
    args = parse_args(__doc__, extra=lambda ap: (
        ap.add_argument("--frames", type=int, default=24),
        ap.add_argument("--chunk", type=int, default=8),
    ))

    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    from aicamera_tpu.runtime.checkpoint import save_state, load_state

    pipe = TrackingPipeline(chunk_size=args.chunk)
    frames = (demo_frame(seed=i) for i in range(args.frames))
    for res in pipe.process_frames(frames):
        print(f"frame {res.frame_index:3d}: {len(res.det_boxes)} dets, "
              f"{len(res.tracks)} tracks")

    # snapshot, then resume into a fresh pipeline
    with tempfile.TemporaryDirectory() as d:
        ckpt = Path(d) / "tracker_state.msgpack"
        save_state(ckpt, pipe.state)
        pipe2 = TrackingPipeline(chunk_size=args.chunk)
        pipe2.state = load_state(ckpt, pipe2.tracker_params)
        print(f"restored tracker state from {ckpt.name}; "
              f"next_id={int(pipe2.state.next_id)}")


if __name__ == "__main__":
    main()
