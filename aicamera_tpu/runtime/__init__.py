"""Inference runtime: the XLA analog of the reference's TensorRT layer.

- :mod:`engine` — ``XLAEngine``: jit/AOT compilation with a persistent
  compile cache, warm-up, and I/O introspection (the ``TRTEngine``
  equivalent, reference ``src/trt_utils/trt_engine.py``).
- :mod:`params` — model parameter resolution: msgpack checkpoint → ONNX
  import → deterministic random init.
- :mod:`pipeline` — the fused per-frame detect+track step and the
  double-buffered frame loop.
- :mod:`profiler` — ``jax.profiler`` trace hooks + per-stage timers
  (capability the reference lacks, SURVEY.md §5).
"""

from .engine import XLAEngine, TensorInfo
from .pipeline import TrackingPipeline, FrameResult
from .checkpoint import save_state, load_state

__all__ = ["XLAEngine", "TensorInfo", "TrackingPipeline", "FrameResult",
           "save_state", "load_state"]
