"""Trustworthy device timing on the tunneled (axon) TPU runtime.

On this runtime ``block_until_ready`` returns without waiting for device
execution — only a data fetch (``jax.device_get``) truly synchronizes.
Wall-clock timing must therefore (a) enqueue many dispatches over DISTINCT
input buffers (the runtime also short-circuits repeat dispatches of the
same (executable, buffer) pair) and (b) end with one ``device_get`` whose
value depends on every dispatch.

``measure`` implements that: each dispatch's outputs are folded to a
scalar by a separate jitted reduce program, and all scalars are fetched in
one ``device_get`` at the end. The reduce adds a read of the output bytes
(same constant for every variant being compared).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


@jax.jit
def fold_outputs(out):
    """Fold any pytree of device arrays to one scalar (one dispatch)."""
    return sum(jnp.sum(leaf.astype(jnp.float32))
               for leaf in jax.tree.leaves(out))


def measure(fn, inputs, *, warmup: int = 1) -> float:
    """Seconds per dispatch of ``fn`` over ``inputs`` (a list of distinct,
    pre-staged argument tuples), timed enqueue→fetch-all. Provide enough
    distinct inputs (>= 10) to amortize the single fetch RPC; do NOT reuse
    inputs across measure() calls of the same fn (short-circuited)."""
    for x in inputs[:warmup]:
        jax.device_get(fold_outputs(fn(*x)))
    rest = inputs[warmup:] or inputs
    t0 = time.perf_counter()
    scalars = [fold_outputs(fn(*x)) for x in rest]
    jax.device_get(scalars)
    return (time.perf_counter() - t0) / len(rest)
