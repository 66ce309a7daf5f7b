"""Tracing and per-stage timing (a capability gap in the reference).

The reference's only instrumentation is ad-hoc ``time.time()`` spans
(SURVEY.md §5: per-frame FPS in the main loop, warm-up timing). This module
provides:

- :class:`StageTimer` — named EMA timers with percentile summaries for
  host-visible stages (decode, dispatch, readback, draw);
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the device timeline (XLA op breakdown);
- :func:`device_cost` — FLOP/byte estimates of a compiled function from
  XLA's cost analysis (the analog of trtexec's layer profile).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


class StageTimer:
    """Accumulates wall-time samples per named stage."""

    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self._samples[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            xs_sorted = sorted(xs)
            n = len(xs_sorted)
            out[name] = {
                "count": n,
                "mean_ms": 1e3 * sum(xs) / n,
                "p50_ms": 1e3 * xs_sorted[n // 2],
                "p95_ms": 1e3 * xs_sorted[min(n - 1, int(n * 0.95))],
                "total_s": sum(xs),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<24} {'count':>6} {'mean':>9} {'p50':>9} "
                 f"{'p95':>9}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<24} {s['count']:>6d} {s['mean_ms']:>8.2f}m "
                f"{s['p50_ms']:>8.2f}m {s['p95_ms']:>8.2f}m")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aicamera_tpu_trace"):
    """Capture a device profile viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_cost(compiled) -> dict:
    """FLOPs / bytes-accessed estimates for a lowered+compiled function."""
    try:
        analyses = compiled.cost_analysis()
        if isinstance(analyses, (list, tuple)):
            analyses = analyses[0]
        return {k: analyses[k] for k in ("flops", "bytes accessed")
                if k in analyses}
    except Exception:
        return {}
