"""A/B the C2f concat implementations on the raw detector forward.

The fusion audit (docs/ROOFLINE.md) attributes ~13% of detector device
time to copies dominated by the C2f concats + FPN layout transitions.
layers.C2f now offers three cv2-input formations with identical params:
  concat  jnp.concatenate (baseline)
  dus     chained dynamic_update_slice into one buffer (bitwise-equal)
  sum     virtual concat: per-chunk matmul partial sums (no buffer;
          K dim per matmul is only c, which can underfill the MXU)

Methodology = config 11 (axon-safe): distinct on-device inputs, outputs
folded to scalars, ONE device_get per timed block, median of 3 blocks,
interleaved A/B/C so tunnel drift hits all variants equally.

Usage: python scripts/profile_c2f_concat.py [--batch 96] [--iters 12]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hw", type=int, default=640)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aicamera_tpu.runtime.engine import enable_persistent_cache
    enable_persistent_cache()
    from aicamera_tpu.models.yolov8 import YOLOv8
    from aicamera_tpu.runtime.params import template_params
    from scripts.axon_timing import fold_outputs

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    b, hw = args.batch, (args.hw, args.hw)
    impls = ("concat", "dus", "sum")
    models = {i: YOLOv8(variant="n", concat_impl=i) for i in impls}
    params = template_params(models["concat"],
                             jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = jax.device_put(params)
    fwd = {i: jax.jit(models[i].apply) for i in impls}

    # distinct on-device inputs (generated on device; tunnel-safe)
    key = jax.random.PRNGKey(0)
    inputs = [jax.random.uniform(k, (b, *hw, 3), jnp.float32)
              for k in jax.random.split(key, args.iters)]
    jax.block_until_ready(inputs)

    # warm/compile every variant first
    for i in impls:
        jax.device_get(fold_outputs(fwd[i](params, inputs[0])))

    results = {i: [] for i in impls}
    for rep in range(args.reps):
        for i in impls:                      # interleaved: drift-fair
            t0 = time.perf_counter()
            scalars = [fold_outputs(fwd[i](params, x)) for x in inputs]
            jax.device_get(scalars)
            dt = (time.perf_counter() - t0) / args.iters
            results[i].append(b / dt)
    out = {"batch": b, "iters": args.iters,
           "method": "interleaved median_of_%d" % args.reps}
    for i in impls:
        r = sorted(results[i])
        out[f"{i}_fps"] = round(r[len(r) // 2], 1)
        out[f"{i}_spread"] = [round(r[0], 1), round(r[-1], 1)]
    base = out["concat_fps"]
    out["dus_vs_concat"] = round(out["dus_fps"] / base, 3)
    out["sum_vs_concat"] = round(out["sum_fps"] / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
