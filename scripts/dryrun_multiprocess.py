"""Two-process (DCN-analog) dryrun: the dp training step over a GLOBAL
mesh spanning multiple OS processes via jax.distributed + gloo CPU
collectives.

On real TPU fleets a mesh axis that crosses hosts rides DCN instead of
ICI; jax.distributed + GSPMD make that transparent — the SAME
make_train_step_dp program (train.py) runs here over a 16-device
('batch',) mesh whose halves live in two processes, with the gradient
all-reduce crossing the process boundary (gloo stands in for DCN).
Scenes are rendered on device from PRNG keys, so no host data needs
cross-process sharding; params/optimizer state are replicated.

Single-process reference (same 16 virtual devices, same seed):
    python scripts/dryrun_multiprocess.py --nprocs 1
Two-process run (launch both; process 0 prints the result JSON):
    python scripts/dryrun_multiprocess.py --nprocs 2 --proc 0 &
    python scripts/dryrun_multiprocess.py --nprocs 2 --proc 1
The loss and the post-step parameter checksum must agree (f32
reduction-order tolerance) — asserted by tests/test_multiprocess.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices_per_proc", type=int, default=None)
    ap.add_argument("--total_devices", type=int, default=16)
    ap.add_argument("--port", type=int, default=19733)
    ap.add_argument("--world", choices=("full", "tiny"), default="full",
                    help="'tiny' shrinks scene/input shapes (48x64 world, "
                         "64x64 input) so the driver's cross-process "
                         "dryrun compiles fast; 'full' (default) is the "
                         "shape the equality test pins.")
    args = ap.parse_args()

    per = args.devices_per_proc or args.total_devices // args.nprocs
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={per}").strip()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.nprocs > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nprocs, process_id=args.proc)
    assert jax.device_count() == args.total_devices, (
        jax.device_count(), args.total_devices)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from aicamera_tpu.models import YOLOv8
    from aicamera_tpu.ops.preprocess import letterbox_spec
    from aicamera_tpu.runtime.params import template_params
    from aicamera_tpu.synthetic import WorldSpec
    from aicamera_tpu.train import TrainConfig, make_train_step_dp

    if args.world == "tiny":
        world = WorldSpec(hw=(48, 64), max_objects=3, presence=1.0)
        input_hw = (64, 64)
    else:
        world = WorldSpec(hw=(96, 128), max_objects=3, presence=1.0)
        input_hw = (128, 128)
    cfg = TrainConfig(batch=args.total_devices, steps=1, scan=1,
                      lr=1e-3, warmup=1, seed=7)
    model = YOLOv8(variant="n", num_classes=80, dtype=jnp.float32)
    params = template_params(model, jnp.zeros((1, 64, 64, 3),
                                              jnp.float32))
    spec = letterbox_spec(world.hw, input_hw)
    sched = optax.constant_schedule(cfg.lr)
    tx = optax.sgd(sched)  # deterministic, no moment state to compare
    opt_state = tx.init(params)

    mesh = Mesh(np.array(jax.devices()).reshape(args.total_devices,),
                ("batch",))
    step = make_train_step_dp(model, world, spec, input_hw, cfg, tx, mesh)
    key = jax.random.PRNGKey(cfg.seed)
    params, opt_state, losses, _aux = step(params, opt_state, key)

    # params are replicated: every process can read them; the gradient
    # all-reduce crossed the process boundary to produce them
    loss = float(np.asarray(jax.device_get(losses))[-1])
    checksum = float(sum(
        np.abs(np.asarray(jax.device_get(p), np.float64)).sum()
        for p in jax.tree.leaves(params)))
    if args.proc == 0:
        print(json.dumps({"nprocs": args.nprocs,
                          "devices": args.total_devices,
                          "loss": round(loss, 6),
                          "param_checksum": round(checksum, 3)}))


if __name__ == "__main__":
    main()
