"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run hardware-free (the reference's core is likewise hardware-free
by construction, SURVEY.md §4). Sharding tests use the 8 virtual CPU devices
as a stand-in for a TPU mesh.
"""

import os
from pathlib import Path

# FORCE cpu: this environment's axon TPU plugin overrides the
# JAX_PLATFORMS env var, so the only reliable switch is the config update
# below (before any backend initialization). Without it, "CPU" tests
# silently run on — and contend for — the single TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: CPU conv compiles take ~7s each in this
# environment; the cache makes repeat suite runs compile-free. The dir is
# scoped by the host's CPU feature flags (engine.host_cpu_tag): this VM
# migrates between physical hosts, and XLA:CPU AOT executables cached on a
# host with different features SIGILL when loaded (observed, 2026-08-19).
from aicamera_tpu.runtime.engine import host_cpu_tag  # noqa: E402

_cache = (Path.home() / ".cache" / "aicamera_tpu" / "xla_cache_tests"
          / host_cpu_tag())
_cache.mkdir(parents=True, exist_ok=True)
# Also guards enable_persistent_cache(): with the env var set, pipeline
# construction inside tests keeps THIS cache dir instead of redirecting
# the process to the main runtime cache mid-suite.
os.environ["JAX_COMPILATION_CACHE_DIR"] = str(_cache)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the JAX_COMPILATION_CACHE_DIR env var is silently ignored by this
# jax version — only the explicit config update enables the cache.
jax.config.update("jax_compilation_cache_dir", str(_cache))
# 5s floor: only the expensive programs (convs ~7s) are worth caching;
# tiny eager-op programs just churn the cache dir. NOTE this floor does
# NOT prevent the XLA:CPU AOT serializer segfault on the large
# bucketed-scan executables — that is handled by disabling the cache for
# the affected module (tests/test_scan_bucket_impl.py fixture).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# Not auto-collected: test_scan_bucket.py runs it in an ISOLATED
# subprocess. XLA:CPU flakily segfaults on this module's large
# bucketed-scan compiles in long-lived suite processes only — two suite
# runs on 2026-08-20 died inside jit compilation / cache serialization at
# this module (different tests, different jax frames) while every
# standalone run of the module passes. Process isolation runs it in the
# configuration that has always been clean.
collect_ignore = ["test_scan_bucket_impl.py",
                  "test_train_dp_impl.py"]


# --- fast/slow tier split (VERDICT r3 #7) ---------------------------------
# Default `pytest -q` runs the fast tier; `--slow` adds the slow tier
# (compile-heavy >60s items: the isolated scan-bucket subprocess suite,
# the 16-device dryrun, trained-weights int8 A/Bs, the clip-parity
# window, service race/load tests). CI runs BOTH tiers — nothing is
# deleted, only deferred. See README "Running the tests".

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run the slow tier (>60s compile-heavy tests)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: slow tier (>60s); run with --slow (CI runs it)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --slow (CI runs both tiers)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
