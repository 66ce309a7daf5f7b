"""Two-process DCN-analog dryrun (VERDICT r3 #8): the dp training step
over a 16-device mesh SPLIT ACROSS TWO OS PROCESSES via
jax.distributed + gloo CPU collectives, asserted equal to the
single-process 16-device run.

On a real TPU fleet the 'batch' axis crossing hosts rides DCN; here
gloo stands in. Both runs execute scripts/dryrun_multiprocess.py (the
same make_train_step_dp program, scenes rendered on device) — only the
process topology differs, so agreement proves the cross-process
gradient all-reduce computes the same sum."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / \
    "dryrun_multiprocess.py"


def _clean_env():
    import os
    env = dict(os.environ)
    # the script sets its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    env = _clean_env()
    single = subprocess.run(
        [sys.executable, str(SCRIPT), "--nprocs", "1"],
        capture_output=True, text=True, timeout=1800, env=env)
    assert single.returncode == 0, single.stderr[-3000:]
    ref = json.loads(single.stdout.strip().splitlines()[-1])

    p0 = subprocess.Popen(
        [sys.executable, str(SCRIPT), "--nprocs", "2", "--proc", "0",
         "--port", "19741"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env)
    p1 = subprocess.Popen(
        [sys.executable, str(SCRIPT), "--nprocs", "2", "--proc", "1",
         "--port", "19741"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env)
    out0, err0 = p0.communicate(timeout=1800)
    out1, err1 = p1.communicate(timeout=1800)
    assert p0.returncode == 0, err0[-3000:]
    assert p1.returncode == 0, err1[-3000:]
    got = json.loads(out0.strip().splitlines()[-1])

    assert got["devices"] == ref["devices"] == 16
    # f32 end-to-end; only the all-reduce partial order differs
    assert abs(got["loss"] - ref["loss"]) <= 1e-3 * max(
        1.0, abs(ref["loss"])), (got, ref)
    assert abs(got["param_checksum"] - ref["param_checksum"]) <= \
        1e-4 * ref["param_checksum"], (got, ref)
