"""Data-parallel train-step tests, run in an ISOLATED subprocess.

The real tests live in ``test_train_dp_impl.py`` (excluded from
collection by conftest). Same pattern and reason as
``test_scan_bucket.py``: XLA:CPU's AOT serializer flakily aborts on
this module's very large scanned fwd+bwd executables in long-lived
suite processes (cold-cache run 2026-08-21 died with SIGABRT inside
``compilation_cache.put_executable_and_time`` here), while standalone
runs — cache on — have always been clean. Subprocess isolation keeps
the persistent-cache speedup without the crash exposure.
"""

import subprocess
import sys
from pathlib import Path

import pytest

IMPL = Path(__file__).with_name("test_train_dp_impl.py")


@pytest.mark.slow
def test_train_dp_suite_isolated():
    # slow tier (71 s measured): >60s compile-heavy subprocess suite —
    # exactly the documented slow-tier class; CI runs both tiers
    r = subprocess.run(
        [sys.executable, "-m", "pytest", str(IMPL), "-q",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, timeout=1800)
    tail = r.stdout[-3000:]
    sys.stdout.write(tail)
    assert r.returncode == 0, (
        f"isolated train-dp run failed (rc={r.returncode})\n"
        f"--- stdout ---\n{tail}\n--- stderr ---\n{r.stderr[-2000:]}")
    assert " passed" in r.stdout and "failed" not in tail
