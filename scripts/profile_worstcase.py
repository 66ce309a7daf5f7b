"""Decompose the worst-case (64-det saturated) chunk step on the device.

  a) full worst-case step (synthetic_load=64, reid on)   — config 7
  b) worst-case step without ReID                        — tracker+detect
  c) ReID forward alone at the saturated crop batch      — embed cost
  d) normal-load step (reid on)                          — headline shape

Uses the axon-safe methodology (scripts/axon_timing.py).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from axon_timing import fold_outputs  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aicamera_tpu import config
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    k = 96
    hw = (540, 960)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 255, (k, *hw, 3), np.uint8))
    base.block_until_ready()
    perturb = jax.jit(lambda c, i: c + i.astype(jnp.uint8))
    salt = iter(range(1, 1000))

    def fresh(m):
        out = [perturb(base, jnp.uint32(next(salt))) for _ in range(m)]
        jax.block_until_ready(out)
        return out

    fv = jnp.ones((k,), bool)

    def run_steps(pipe, chunks):
        """State-chained steps (the real dependency structure), fetch-all."""
        step = pipe._get_step(hw, k)
        pipe.reset()
        state = pipe.state
        outs = []
        t0 = time.perf_counter()
        for c in chunks:
            state, det_outs, track_outs = step(
                pipe.yolo_params, pipe.reid_params, state, c, fv)
            outs.append(fold_outputs(track_outs))
        jax.device_get(outs)
        return (time.perf_counter() - t0) / len(chunks)

    rows = []
    n = 8

    pipe = TrackingPipeline(chunk_size=k, synthetic_load=config.MAX_DETECTIONS)
    pipe.warm_up(hw)
    rows.append(("worst-case full", run_steps(pipe, fresh(n))))
    del pipe

    pipe = TrackingPipeline(chunk_size=k, with_reid=False,
                            synthetic_load=config.MAX_DETECTIONS)
    pipe.warm_up(hw)
    rows.append(("worst-case no-reid", run_steps(pipe, fresh(n))))
    del pipe

    pipe = TrackingPipeline(chunk_size=k)
    pipe.warm_up(hw)
    rows.append(("normal full", run_steps(pipe, fresh(n))))

    # ReID forward alone at the saturated batch (96 frames x 32 crops)
    from axon_timing import measure
    reid, reid_params = pipe.reid, pipe.reid_params
    gen = jax.jit(lambda s: jax.random.uniform(
        jax.random.PRNGKey(s), (k * 32, 128, 64, 3)).astype(jnp.bfloat16))
    crops = [(gen(jnp.uint32(1000 + i)),) for i in range(n)]
    jax.block_until_ready(crops)
    f = jax.jit(lambda c: reid.apply(reid_params, c))
    rows.append(("reid fwd 3072 crops", measure(f, crops)))

    print(f"{'part':<22}{'ms/chunk':>10}{'fps':>9}")
    for name, t in rows:
        print(f"{name:<22}{t * 1e3:>10.2f}{k / t:>9.0f}")


if __name__ == "__main__":
    main()
