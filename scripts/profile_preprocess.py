"""Compare preprocess implementations on the real device at several
frame sizes: XLA path vs Pallas kernel (and variants under test)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu.ops.pallas_preprocess import preprocess_yolo_pallas
    from aicamera_tpu.ops.preprocess import letterbox_spec, preprocess_yolo

    k = 96
    rng = np.random.default_rng(0)
    for hw in ((540, 960), (720, 1280), (1080, 1920)):
        frames = jnp.asarray(rng.integers(0, 255, (k, *hw, 3), np.uint8))
        frames.block_until_ready()
        spec = letterbox_spec(hw, (640, 640))

        for name, pre in (("xla", preprocess_yolo),
                          ("pallas", preprocess_yolo_pallas)):
            f = jax.jit(lambda fr, pre=pre: jax.vmap(
                lambda x: pre(x, spec, out_dtype=jnp.bfloat16)[0])(fr))
            t = timed(f, frames)
            print(f"{hw} {name:<8} {t * 1e3:8.2f} ms/chunk "
                  f"{t * 1e6 / k:8.1f} us/frame")


if __name__ == "__main__":
    main()
