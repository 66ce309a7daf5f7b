"""16-virtual-device multichip dryrun, in an isolated subprocess.

The conftest pins THIS process to 8 virtual CPU devices, so the 16-device
case (which additionally exercises the composed stage x stream x model
forward — 3 pipeline stages each on a 2x2 ('stream','model') sub-mesh,
bitwise-checked against the single-device stage split inside
``dryrun_multichip``) runs in a fresh child process with its own device
count. The driver keeps invoking the 8-device case directly.
"""

import os
import pytest
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_dryrun_multichip_16_devices():
    env = dict(os.environ)
    # child must not inherit the conftest's 8-device XLA_FLAGS
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(16)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    sys.stdout.write(r.stdout[-2000:])
    assert r.returncode == 0, (
        f"16-device dryrun failed (rc={r.returncode})\n"
        f"--- stdout ---\n{r.stdout[-3000:]}\n"
        f"--- stderr ---\n{r.stderr[-3000:]}")
    assert "dryrun_multichip OK: 16-device mesh" in r.stdout
    assert "composed pp x dp x tp" in r.stdout
