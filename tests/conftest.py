"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run hardware-free (the reference's core is likewise hardware-free
by construction, SURVEY.md §4). Sharding tests use the 8 virtual CPU devices
as a stand-in for a TPU mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
