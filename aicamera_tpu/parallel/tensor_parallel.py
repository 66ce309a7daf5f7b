"""Tensor parallelism for the detector: GSPMD channel sharding.

Stream data-parallelism (:mod:`multistream`) is the primary scaling axis —
tracking state is per-stream so it needs no collectives. For large
variants (YOLOv8l/x at high resolution) a second mesh axis shards the
*model*: every conv kernel's output-channel dimension is placed on the
``model`` axis and XLA's GSPMD partitioner splits each conv across chips,
inserting the (ICI) collectives where activations change sharding. This is
the TPU-idiomatic form of tensor parallelism — annotate, don't hand-write
collectives.

Usage::

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("stream", "model"))
    params = shard_detector_params(params, mesh)      # weights sharded
    fn = jax.jit(model.apply)                          # GSPMD does the rest
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(x, axis: str, axis_size: int):
    """Shard the output-channel (last) dim when it divides the axis."""
    shape = np.shape(x)
    if len(shape) == 0:
        return P()
    if shape[-1] % axis_size != 0:
        return P()  # replicate non-divisible leaves (e.g. 80-class heads)
    if len(shape) == 4:   # conv kernel HWIO -> shard O
        return P(None, None, None, axis)
    if len(shape) == 2:   # dense (in, out) -> shard out
        return P(None, axis)
    if len(shape) == 1:   # bias/scale
        return P(axis)
    return P()


def shard_detector_params(params, mesh: Mesh, axis: str = "model"):
    """Place detector params on the mesh with channel sharding.

    Conv kernels/biases shard their output-channel dim on ``axis``; leaves
    whose channel count doesn't divide the axis size stay replicated (XLA
    still partitions the ops around them).
    """
    axis_size = mesh.shape[axis]
    shardings = jax.tree.map(
        lambda x: NamedSharding(mesh, _spec_for(x, axis, axis_size)), params)
    return jax.device_put(params, shardings)


def replicate_params(params, mesh: Mesh):
    """Fully replicate params over the mesh (the data-parallel default)."""
    return jax.device_put(params, NamedSharding(mesh, P()))
