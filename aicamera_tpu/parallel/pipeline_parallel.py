"""Pipeline parallelism: depth-wise stage split of the detector forward.

The reference is single-GPU with no model-parallel story (SURVEY §5).
This framework already scales data-parallel over streams
(:mod:`multistream`) and tensor-parallel over conv channels
(:mod:`tensor_parallel`); this module adds the third axis — PIPELINE
parallelism: the detector's three natural stages (CSP backbone, PAN-FPN
neck, decoupled head — `models/yolov8.py`) live on different devices and
microbatches stream through them GPipe-style.

No custom scheduler is needed: JAX dispatch is asynchronous, so enqueueing
stage k of microbatch i immediately after stage k of microbatch i-1 lets
XLA run stage k(i) on its device while stage k+1(i-1) executes on the
next — the host race-ahead builds the pipeline, and inter-stage activation
transfers ride ICI on a real TPU mesh (explicit `jax.device_put` between
committed device placements). Steady-state throughput is bounded by the
slowest stage, with (n_stages - 1) microbatches of fill/drain bubble.

Use cases: model variants whose weights + activations outgrow one chip's
HBM (YOLOv8x at 4K inputs), or composing with stream parallelism on a 2-D
mesh (streams x stages). For single-chip serving the fused single-program
forward in `runtime/pipeline.py` is always preferable — XLA fuses across
stage boundaries there; stage-splitting trades that fusion for placement
freedom.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.yolov8 import Backbone, DetectHead, Neck
from .tensor_parallel import shard_detector_params

__all__ = ["PipelineParallelDetector", "split_stage_params"]


def split_stage_params(full_params) -> Tuple[Any, Any, Any]:
    """Split a full YOLOv8 param tree into per-stage trees.

    The full model nests its submodules under ``backbone`` / ``neck`` /
    ``head`` (`models/yolov8.py::YOLOv8`), so the standalone stage modules
    accept the corresponding subtrees directly. Works with the trees from
    `runtime/params.py::resolve_yolo_params` (ONNX-imported, msgpack or
    seeded-random).
    """
    p = full_params["params"]
    return ({"params": p["backbone"]}, {"params": p["neck"]},
            {"params": p["head"]})


class PipelineParallelDetector:
    """Stage-split YOLOv8 forward over up to three devices.

    Args:
        variant: YOLOv8 variant letter (n/s/m/l/x).
        devices: stage placement, one device per stage (backbone, neck,
            head). Fewer than three devices cycle (e.g. two devices put
            backbone on 0, neck on 1, head on 0); a single device is the
            degenerate-but-valid case (useful as a numerics oracle: the
            same three-program split without cross-device hops).
        num_classes / dtype: forwarded to the stage modules.

    ``forward(full_params, frames, microbatch)`` returns exactly the full
    model's per-level (box_bins, cls_logits) outputs, so the result feeds
    `ops/nms.py::fused_decode_nms` unchanged.
    """

    def __init__(self, variant: str = "n",
                 devices: Optional[Sequence[Any]] = None,
                 num_classes: int = 80,
                 dtype: jnp.dtype = jnp.bfloat16,
                 meshes: Optional[Sequence[Mesh]] = None):
        if meshes is not None:
            # Composed mode: each STAGE runs on its own 2-D
            # ('stream', 'model') sub-mesh — data parallelism over the
            # microbatch x tensor parallelism over conv output channels
            # WITHIN every pipeline stage. All three parallelism axes in
            # one forward: stage (pipeline) x stream (dp) x model (tp).
            if devices is not None:
                raise ValueError("pass either devices or meshes, not both")
            meshes = list(meshes)
            if not meshes:
                raise ValueError("need at least one mesh")
            for m in meshes:
                if set(m.axis_names) != {"stream", "model"}:
                    raise ValueError(
                        "stage meshes must have axes ('stream', 'model'), "
                        f"got {m.axis_names}")
            self.meshes = [meshes[i % len(meshes)] for i in range(3)]
            self.devices = [m.devices.flatten()[0] for m in self.meshes]
        else:
            self.meshes = None
            if devices is None:
                devices = jax.devices()[:3]
            if not devices:
                raise ValueError("need at least one device")
            self.devices = [devices[i % len(devices)] for i in range(3)]
        self.variant = variant
        backbone = Backbone(variant, dtype=dtype)
        neck = Neck(variant, dtype=dtype)
        head = DetectHead(variant, num_classes, dtype=dtype)

        # One jitted program per stage. Computation placement follows the
        # committed device of the arguments (params + activations are
        # device_put to the stage device), so no placement args needed.
        self._stage_fns = (
            jax.jit(lambda p, x: backbone.apply(p, x)),
            jax.jit(lambda p, f: neck.apply(p, *f)),
            jax.jit(lambda p, f: head.apply(p, f)),
        )
        self._stage_params = None

    def place_params(self, full_params) -> None:
        """Commit each stage's params to its device/mesh (one-time upload).

        In composed (meshes) mode each stage's conv kernels are channel-
        sharded over that stage mesh's 'model' axis (tensor_parallel.py);
        GSPMD partitions the stage program accordingly.
        """
        trees = split_stage_params(full_params)
        if self.meshes is not None:
            self._stage_params = tuple(
                shard_detector_params(t, m)
                for t, m in zip(trees, self.meshes))
        else:
            self._stage_params = tuple(
                jax.device_put(t, d) for t, d in zip(trees, self.devices))

    def _to_stage(self, tree, k: int):
        """Move activations to stage k: its device, or its mesh with the
        batch axis sharded over 'stream' (activations re-shard across the
        inter-stage hop — on a real TPU slice this is an ICI transfer)."""
        if self.meshes is None:
            return jax.device_put(tree, self.devices[k])
        return jax.device_put(
            tree, NamedSharding(self.meshes[k], P("stream")))

    def forward(self, frames, microbatch: Optional[int] = None):
        """Run the detector over ``frames`` (B, H, W, C float in [0, 1]).

        Splits the batch into microbatches and streams them through the
        stages; returns the per-level outputs concatenated over the batch
        axis. ``microbatch=None`` uses B // 2 (two in flight) — at least
        two microbatches are required for any overlap.
        """
        if self._stage_params is None:
            raise RuntimeError("call place_params(full_params) first")
        b = frames.shape[0]
        # composed mode shards every microbatch over each stage mesh's
        # 'stream' axis, so the microbatch must divide by all of them
        stream_div = 1
        if self.meshes is not None:
            for m in self.meshes:
                stream_div = math.lcm(stream_div, m.shape["stream"])
        if microbatch is None:
            if b % stream_div:
                raise ValueError(
                    f"batch {b} not divisible by the stage meshes' "
                    f"'stream' axis size(s) (lcm {stream_div}) — no "
                    "microbatch can shard it")
            # largest stream_div multiple that divides b while keeping at
            # least two microbatches in flight; falls back to one
            # microbatch (mb = b) so the default never raises for a batch
            # the explicit path would accept
            mb = b
            for cand in range((b // 2) // stream_div * stream_div, 0,
                              -stream_div):
                if b % cand == 0:
                    mb = cand
                    break
        else:
            mb = microbatch
            if mb % stream_div:
                raise ValueError(
                    f"microbatch {mb} must be divisible by the stage "
                    f"meshes' 'stream' axis size(s) (lcm {stream_div}) — "
                    "each microbatch is batch-sharded over that axis")
        if b % mb:
            raise ValueError(f"batch {b} not divisible by microbatch {mb}")
        bp, np_, hp = self._stage_params
        f_back, f_neck, f_head = self._stage_fns
        outs = []
        for i in range(0, b, mb):
            x = self._to_stage(frames[i:i + mb], 0)
            feats = f_back(bp, x)
            feats = self._to_stage(feats, 1)
            feats = f_neck(np_, feats)
            feats = self._to_stage(feats, 2)
            outs.append(f_head(hp, feats))
            # async dispatch: the next microbatch's backbone enqueues
            # immediately; no block_until_ready inside the loop.
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
