"""XLA compiler-flag A/B on the raw YOLOv8n forward (VERDICT r4 #7).

The roofline audit (docs/ROOFLINE.md) leaves the detect forward at ~25%
MXU with ~13% of device time in copies, and names compiler-side levers
(fusion/layout flags) as the remaining untried ideas — the analog of
trtexec's engine-level build flags (reference export_trt_engines.sh:37).
This harness measures candidate XLA flag sets on the production chunk-96
forward with the axon-safe methodology (distinct staged inputs, folded
outputs, one fetch), each flag set in its OWN subprocess (XLA_FLAGS is
parsed once per process).

Caveat probed by the baseline-repeat config: on the axon tunneled
runtime, compilation happens via a remote-compile service — if a flag
set measures bitwise-equal compile times AND identical FPS to baseline,
the flags likely never reached the compiler, and that is the recorded
finding.

Usage (TPU, sequential): python scripts/profile_xla_flags.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

FLAG_SETS = [
    ("baseline", ""),
    ("baseline_repeat", ""),   # run-to-run noise floor
    ("vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("no_multi_dim_fusion",
     "--xla_tpu_enable_multi_level_nested_dedup_fusion=false"),
]

CHILD = r"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, {root!r})
sys.path.insert(0, {scripts!r})
from axon_timing import measure
import jax, jax.numpy as jnp, numpy as np
from aicamera_tpu import config
from aicamera_tpu.ops.preprocess import letterbox_spec, preprocess_yolo
from aicamera_tpu.runtime.params import resolve_yolo_params

k = 96
frame_hw = (540, 960)
spec = letterbox_spec(frame_hw, config.YOLO_INPUT_SHAPE)
model, params = resolve_yolo_params("n")
rng = np.random.default_rng(0)
base = jnp.asarray(rng.integers(0, 255, (k, *frame_hw, 3), np.uint8))
base.block_until_ready()

@jax.jit
def perturb(c, i):
    return c + i.astype(jnp.uint8)

def fresh(m):
    out = [(perturb(base, jnp.uint32(i + 1)),) for i in range(m)]
    jax.block_until_ready(out)
    return out

def fwd(fr):
    x = jax.vmap(lambda f: preprocess_yolo(f, spec,
                                           out_dtype=jnp.bfloat16)[0])(fr)
    return model.apply(params, x)

t0 = time.perf_counter()
fn = jax.jit(fwd)
fn(base)  # compile
compile_s = time.perf_counter() - t0
sec = measure(fn, fresh(11))
print(json.dumps({{"compile_s": round(compile_s, 2),
                   "ms_per_chunk": round(sec * 1e3, 3),
                   "fps": round(k / sec, 1)}}))
"""


def main():
    out_path = ROOT / "benchmarks" / "xla_flags_ab.jsonl"
    child_src = CHILD.format(root=str(ROOT), scripts=str(ROOT / "scripts"))
    for name, flags in FLAG_SETS:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", child_src],
                           capture_output=True, text=True, timeout=1800,
                           env=env)
        row = {"flags": name, "xla_flags": flags,
               "wall_s": round(time.time() - t0, 1)}
        if r.returncode == 0:
            try:
                row.update(json.loads(r.stdout.strip().splitlines()[-1]))
            except Exception:
                row["error"] = f"unparseable: {r.stdout[-300:]}"
        else:
            row["error"] = (r.stderr or r.stdout)[-400:]
        line = json.dumps(row)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")
        time.sleep(150)  # inter-process tunnel recovery (CLAUDE.md)


if __name__ == "__main__":
    main()
