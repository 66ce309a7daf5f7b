"""Capacity-bucketed tracker scan tests, run in an ISOLATED subprocess.

The real tests live in ``test_scan_bucket_impl.py`` (excluded from
collection by conftest). XLA:CPU flakily segfaults on that module's large
bucketed-scan compiles — but only in long-lived suite processes: two full
suite runs on 2026-08-20 died there (one inside the persistent-cache
serializer, one inside jit compilation itself — different tests,
different jax frames, 125 GB RAM free), while every standalone run of the
module passes, cache on or off. Running the module in a fresh child
process per suite run keeps the whole suite green without giving up any
coverage; the child's output is attached on failure.
"""

import pytest
import subprocess
import sys
from pathlib import Path

IMPL = Path(__file__).with_name("test_scan_bucket_impl.py")


@pytest.mark.slow
def test_scan_bucket_suite_isolated():
    r = subprocess.run(
        [sys.executable, "-m", "pytest", str(IMPL), "-q",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, timeout=2400)
    tail = r.stdout[-3000:]
    sys.stdout.write(tail)
    assert r.returncode == 0, (
        f"isolated scan-bucket run failed (rc={r.returncode})\n"
        f"--- stdout ---\n{tail}\n--- stderr ---\n{r.stderr[-2000:]}")
    assert " passed" in r.stdout and "failed" not in tail
