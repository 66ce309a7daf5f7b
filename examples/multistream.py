"""Multi-stream tracking sharded over a device mesh.

Eight independent camera streams advance in lockstep: every step batches
all S frames through one fused detect+embed program, then a vmapped
per-stream tracker update. With a ``Mesh(('stream',))`` the batch is
sharded across chips with zero hot-path collectives (tracker state is
per-stream). On CPU this runs over 8 virtual devices (--cpu).

    python examples/multistream.py --cpu [--steps 4]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples._common import parse_args, demo_frame  # noqa: E402


def main():
    args = parse_args(__doc__, extra=lambda ap: (
        ap.add_argument("--steps", type=int, default=4),
        ap.add_argument("--streams", type=int, default=8),
    ))

    import numpy as np
    import jax
    from aicamera_tpu.parallel import MultiStreamPipeline, make_stream_mesh

    n_dev = len(jax.devices())
    mesh = make_stream_mesh() if args.streams % n_dev == 0 and n_dev > 1 \
        else None
    print(f"{args.streams} streams over "
          f"{'a ' + str(n_dev) + '-device mesh' if mesh else 'one device'}")

    hw = (288, 512)
    pipe = MultiStreamPipeline(n_streams=args.streams, frame_hw=hw,
                               mesh=mesh)
    for t in range(args.steps):
        frames = np.stack([demo_frame(hw, seed=100 * s + t)
                           for s in range(args.streams)])
        tlbr, ids, cls, conf, mask = pipe.step(frames)
        counts = np.asarray(mask).sum(axis=-1)
        print(f"step {t}: confirmed tracks per stream = {counts.tolist()}")


if __name__ == "__main__":
    main()
