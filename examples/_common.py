"""Shared helpers for the example scripts."""

import argparse
import os


def parse_args(description, extra=None):
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--cpu", action="store_true",
                    help="force the hardware-free CPU backend "
                         "(8 virtual devices)")
    if extra:
        extra(ap)
    args = ap.parse_args()
    if args.cpu:
        # Must happen before the first jax backend touch. The env var alone
        # is overridden by the axon TPU plugin; the explicit config update
        # is required (CLAUDE.md).
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    return args


def demo_frame(hw=(540, 960), seed=0):
    """A deterministic synthetic BGR frame (no asset dependency)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    frame = rng.integers(0, 40, (*hw, 3), np.uint8)
    # paint a few solid rectangles so crops/boxes have structure
    # (sizes scale down for small demo frames)
    rw, rh = min(120, hw[1] // 2), min(160, hw[0] // 2)
    for _ in range(4):
        x, y = rng.integers(0, hw[1] - rw), rng.integers(0, hw[0] - rh)
        w, h = rng.integers(rw // 3, rw), rng.integers(rh // 2, rh)
        frame[y:y + h, x:x + w] = rng.integers(60, 255, 3, np.uint8)
    return frame
