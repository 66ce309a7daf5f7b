"""XLAEngine: compiled-function runtime with warm-up and I/O introspection.

The TPU-native replacement for the reference's ``TRTEngine``
(``src/trt_utils/trt_engine.py``): where TensorRT deserializes an AOT-built
``.engine`` and executes it on a CUDA stream, XLAEngine wraps a JAX function
with:

- **AOT compile** via ``jax.jit(...).lower(...).compile()`` keyed on input
  shapes, with JAX's persistent compilation cache enabled so the second
  process start skips compilation (the analog of TensorRT's engine-build-
  once workflow, ``scripts/export_trt_engines.sh``).
- **Warm-up** iterations with dummy inputs (TRTEngine._warm_up :119-149).
- **I/O introspection**: input/output names, shapes and dtypes
  (TRTEngine._init_bindings_info :62-87, get_input_details :212-216).
- **Async dispatch**: like ``execute_async_v3`` on the caller's stream
  (:188-203), calls return device arrays immediately; the caller decides
  when to block (JAX's async dispatch model).
"""

from __future__ import annotations

import json
import os
import struct
import time
from pathlib import Path
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class TensorInfo(NamedTuple):
    """Parity with reference TensorInfo (trt_engine.py:11)."""
    name: str
    shape: tuple
    dtype: Any


_CACHE_INITIALIZED = False


def host_cpu_tag() -> str:
    """Short fingerprint of the host's CPU feature flags.

    XLA:CPU AOT-serialized executables embed the compile machine's feature
    set; loading them on a host with a DIFFERENT detected feature set (this
    VM migrates between physical hosts) logs cpu_aot_loader errors and can
    SIGILL outright. The persistent cache therefore lives in a
    per-feature-set subdirectory — a migrated VM recompiles into a fresh
    one instead of crashing on stale entries.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nohost"


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (engine-build-once UX)."""
    global _CACHE_INITIALIZED
    if _CACHE_INITIALIZED:
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        _CACHE_INITIALIZED = True  # already configured (e.g. by conftest)
        return
    cache_dir = cache_dir or os.environ.get(
        "AICAMERA_COMPILE_CACHE",
        str(Path.home() / ".cache" / "aicamera_tpu" / "xla_cache"
            / host_cpu_tag()))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 5s floor — the programs worth caching (convs, fused chunk
        # steps) take far longer; tiny eager-op programs just churn the
        # cache dir (see tests/conftest.py for the CPU-serializer caveat).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _CACHE_INITIALIZED = True
    except Exception:  # pragma: no cover - older jax versions
        pass


class XLAEngine:
    """Wraps a pure function into a compiled, warmed-up engine.

    Args:
        fn: pure function ``fn(*inputs) -> outputs`` (pytrees allowed).
        example_inputs: concrete or ShapeDtypeStruct inputs fixing shapes.
        name: label for logs/profiling.
        warmup_iters: forward passes to run at build (reference does 5).
        donate_argnums: arguments whose buffers XLA may reuse in-place.
    """

    def __init__(self, fn: Callable, example_inputs: Sequence[Any],
                 name: str = "engine", warmup_iters: int = 5,
                 static_argnums: Sequence[int] = (),
                 donate_argnums: Sequence[int] = ()):
        enable_persistent_cache()
        self.name = name
        self._fn = fn
        jitted = jax.jit(fn, static_argnums=static_argnums,
                         donate_argnums=donate_argnums)
        shapes = jax.tree.map(
            lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
            else jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype
                                      if not hasattr(x, "dtype") else x.dtype),
            list(example_inputs))
        t0 = time.perf_counter()
        self._compiled = jitted.lower(*shapes).compile()
        self.compile_seconds = time.perf_counter() - t0
        self._in_info = [
            TensorInfo(f"input_{i}", tuple(s.shape), s.dtype)
            for i, s in enumerate(jax.tree.leaves(shapes))]
        out_shapes = jax.eval_shape(fn, *shapes)
        self._out_info = [
            TensorInfo(f"output_{i}", tuple(s.shape), s.dtype)
            for i, s in enumerate(jax.tree.leaves(out_shapes))]
        self.warmup_seconds = 0.0
        if warmup_iters > 0 and not donate_argnums:
            self._warm_up(shapes, warmup_iters)

    def _warm_up(self, shapes, iters: int) -> None:
        """Run dummy forward passes so first real inference is steady-state
        (parity with TRTEngine._warm_up, trt_engine.py:119-149)."""
        dummies = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = self._compiled(*dummies)
        jax.block_until_ready(out)
        self.warmup_seconds = time.perf_counter() - t0

    def __call__(self, *inputs):
        """Async execution: returns device arrays without blocking (the
        caller syncs, exactly like the reference's stream contract)."""
        return self._compiled(*inputs)

    # --- introspection (TRTEngine.get_input_details/get_output_details) ---
    def get_input_details(self):
        return list(self._in_info)

    def get_output_details(self):
        return list(self._out_info)

    def cost_analysis(self):
        """FLOP/byte estimates from XLA (no TensorRT analog — bonus)."""
        try:
            return self._compiled.cost_analysis()
        except Exception:
            return {}


# --------------------------------------------------------------------------
# Serialized engine artifacts (.xlae) — the TRT ``.engine`` file analog.
#
# The reference's build system (scripts/export_trt_engines.sh) compiles ONNX
# models into self-contained ``.engine`` files that the runtime deserializes
# with no model code or weight files present (trt_engine.py:45-60). The
# TPU-native equivalent is ``jax.export``: the traced function — with its
# weights closed over, so they are baked into the artifact as constants —
# is serialized as portable StableHLO. ``load_engine`` replays it on any
# exported platform; XLA recompiles once per process (amortized by the
# persistent compilation cache), which is the XLA counterpart of TRT's
# deserialize step.
# --------------------------------------------------------------------------

ENGINE_FILE_SUFFIX = ".xlae"
_ENGINE_MAGIC = b"AICAMXLAE1"


def is_engine_file(path) -> bool:
    """True if ``path`` names a serialized engine artifact (by suffix)."""
    return path is not None and str(path).endswith(ENGINE_FILE_SUFFIX)


def export_engine(fn: Callable, example_inputs: Sequence[Any], path,
                  name: str = "engine", metadata: dict | None = None,
                  platforms: Sequence[str] = ("cpu", "tpu")) -> Path:
    """Serialize ``fn`` (weights closed over → baked as constants) to
    ``path``.

    Args:
        fn: pure function of the runtime inputs only. Anything it closes
            over (model parameters, letterbox specs, thresholds) is
            embedded in the artifact, exactly like weights inside a TRT
            engine.
        example_inputs: concrete arrays or ShapeDtypeStructs fixing the
            input signature. Entries may carry ``jax.export`` symbolic
            dimensions (e.g. a dynamic batch axis — the analog of the
            reference ReID engine's dynamic batch 1..8,
            export_trt_engines.sh:32-34).
        path: output file; conventionally ``*.xlae``.
        name: engine label stored in the header.
        metadata: extra JSON-serializable facts (input shapes, thresholds)
            recorded in the header for load-time introspection/validation.
        platforms: lowering platforms baked into the artifact. The default
            covers both this framework's production backend and the
            hardware-free CPU test backend.
    """
    from jax import export as jax_export

    specs = [x if isinstance(x, jax.ShapeDtypeStruct)
             else jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype
                                       if not hasattr(x, "dtype") else x.dtype)
             for x in example_inputs]
    exported = jax_export.export(
        jax.jit(fn), platforms=tuple(platforms))(*specs)
    blob = exported.serialize()
    header = json.dumps({
        "name": name,
        "platforms": list(platforms),
        "metadata": metadata or {},
    }).encode("utf-8")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(_ENGINE_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    return path


class SerializedEngine:
    """A deserialized ``.xlae`` engine: callable, introspectable, and
    composable (its :attr:`exported`.call can be traced inside a larger
    jitted program).

    Mirrors the runtime face of ``TRTEngine`` (trt_engine.py:28-216):
    deserialize once, introspect I/O, async execution. Inputs whose
    exported shape is symbolic (dynamic batch) compile once per concrete
    shape, like TRT optimization profiles.
    """

    def __init__(self, exported, name: str, metadata: dict,
                 platforms: Sequence[str]):
        self.exported = exported
        self.name = name
        self.metadata = metadata
        self.platforms = tuple(platforms)
        self._jitted = jax.jit(exported.call)
        self._in_info = [
            TensorInfo(f"input_{i}", tuple(a.shape), a.dtype)
            for i, a in enumerate(exported.in_avals)]
        self._out_info = [
            TensorInfo(f"output_{i}", tuple(a.shape), a.dtype)
            for i, a in enumerate(exported.out_avals)]

    @classmethod
    def load(cls, path) -> "SerializedEngine":
        """Deserialize an engine artifact (TRTEngine._init_engine analog)."""
        enable_persistent_cache()
        with open(path, "rb") as f:
            data = f.read()
        if not data.startswith(_ENGINE_MAGIC):
            raise ValueError(
                f"{path}: not a serialized engine file (bad magic); "
                f"expected an artifact written by export_engine()")
        off = len(_ENGINE_MAGIC)
        (hlen,) = struct.unpack_from("<I", data, off)
        off += 4
        header = json.loads(data[off:off + hlen].decode("utf-8"))
        from jax import export as jax_export
        exported = jax_export.deserialize(bytearray(data[off + hlen:]))
        backend = jax.default_backend()
        if backend not in header.get("platforms", []):
            import warnings
            warnings.warn(
                f"{path}: engine was exported for platforms "
                f"{header.get('platforms')} but the current backend is "
                f"'{backend}'; calls will fail unless jax can lower it.",
                stacklevel=2)
        return cls(exported, header.get("name", "engine"),
                   header.get("metadata", {}), header.get("platforms", ()))

    def __call__(self, *inputs):
        """Async execution; the caller syncs (reference stream contract)."""
        return self._jitted(*inputs)

    def warm_up(self, example_inputs: Sequence[Any], iters: int = 5) -> None:
        """Compile + steady-state for concrete shapes (TRTEngine._warm_up)."""
        dummies = [jnp.zeros(np.shape(x), getattr(x, "dtype", np.float32))
                   if not isinstance(x, jax.ShapeDtypeStruct)
                   else jnp.zeros(x.shape, x.dtype) for x in example_inputs]
        out = None
        for _ in range(max(1, iters)):
            out = self._jitted(*dummies)
        jax.block_until_ready(out)

    def get_input_details(self):
        return list(self._in_info)

    def get_output_details(self):
        return list(self._out_info)

    def cost_analysis(self):
        return {}


def load_engine(path) -> SerializedEngine:
    """Convenience alias: deserialize a ``.xlae`` artifact."""
    return SerializedEngine.load(path)
