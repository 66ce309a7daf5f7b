"""Microbenchmark alternative lowerings for the decode+NMS hot parts.

Candidates measured against the current implementations (axon-safe
methodology, scripts/axon_timing.py):

- ``lax.approx_max_k`` (TPU PartialReduce) vs sort-based ``lax.top_k``
  for 8400->300 candidate selection;
- one-hot matmul vs ``take_along_axis`` row-gather for the (300, 64)
  DFL-bin fetch;
- cumsum-rank compaction matmul vs ``top_k(300->100)`` for the final
  emit of kept, already score-ordered candidates.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from axon_timing import measure  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from aicamera_tpu.runtime.engine import enable_persistent_cache
    enable_persistent_cache()

    b, a, k, md = 96, 8400, 300, 100
    _salt = iter(range(1, 100000))

    def fresh(shape, dtype=np.float32, scale=1.0, m=10):
        gen = jax.jit(lambda s: (
            jax.random.uniform(jax.random.PRNGKey(s), shape) * scale
        ).astype(dtype))
        out = [(gen(jnp.uint32(next(_salt))),) for _ in range(m)]
        jax.block_until_ready(out)
        return out

    print(f"{'part':<26}{'ms/chunk':>10}{'us/frame':>10}", flush=True)
    rows = []

    def add(name, t):
        rows.append((name, t))
        print(f"{name:<26}{t * 1e3:>10.3f}{t * 1e6 / b:>10.2f}", flush=True)

    # -- candidate selection 8400 -> 300 ------------------------------
    f = jax.jit(lambda x: lax.top_k(x, k))
    add("top_k 8400->300", measure(f, fresh((b, a))))

    f = jax.jit(lambda x: lax.approx_max_k(x, k, recall_target=1.0))
    add("approx_max_k r=1.0", measure(f, fresh((b, a))))

    f = jax.jit(lambda x: lax.approx_max_k(x, k, recall_target=0.95))
    add("approx_max_k r=0.95", measure(f, fresh((b, a))))

    # hierarchical exact: block top-k then merge
    def hier(x):
        xb = x.reshape(b, 4, 2100)
        s, i = lax.top_k(xb, k)            # (b, 4, 300)
        s = s.reshape(b, 4 * k)
        i = (i + (jnp.arange(4) * 2100)[None, :, None]).reshape(b, 4 * k)
        s2, p = lax.top_k(s, k)
        return s2, jnp.take_along_axis(i, p, axis=1)
    add("hier top_k 4x2100", measure(jax.jit(hier), fresh((b, a))))

    # -- bins fetch (300, 64) from (8400, 64) -------------------------
    bins = [(x[0].astype(jnp.bfloat16),) for x in fresh((b, a, 64))]
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, a, (b, k)).astype(np.int32))

    f = jax.jit(lambda bb: jnp.take_along_axis(bb, idx[..., None], axis=1))
    add("gather rows take_along", measure(f, bins))

    def onehot_mm(bb):
        oh = (idx[:, :, None] == jnp.arange(a)[None, None, :]).astype(
            jnp.bfloat16)                      # (b, 300, 8400)
        return jnp.einsum("bka,bad->bkd", oh, bb,
                          preferred_element_type=jnp.float32)
    add("gather rows one-hot mm", measure(jax.jit(onehot_mm), bins))
    del bins

    # -- final emit: top 100 kept of 300 score-ordered ---------------
    vals = fresh((b, k, 6))
    keptb = [(x[0] > 0.5,) for x in fresh((b, k))]
    paired = [(v[0], kk[0]) for v, kk in zip(vals, keptb)]

    def emit_topk(v, kept):
        score = jnp.where(kept, v[..., 0], -1.0)
        s, pos = lax.top_k(score, md)
        return jnp.take_along_axis(v, pos[..., None], axis=1), s

    def emit_rank(v, kept):
        # kept candidates are score-ordered: compaction = scatter by rank
        rank = jnp.cumsum(kept.astype(jnp.int32), axis=-1) - 1   # (b, k)
        rank = jnp.where(kept, rank, md + 1)
        oh = (rank[:, :, None] == jnp.arange(md)[None, None, :]).astype(
            jnp.bfloat16)                        # (b, k, md)
        out = jnp.einsum("bkm,bkd->bmd", oh, v.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out, jnp.max(oh, axis=1)

    add("emit top_k 300->100", measure(jax.jit(emit_topk), paired))
    add("emit rank-compact mm", measure(jax.jit(emit_rank), paired))

    print("done", len(rows))


if __name__ == "__main__":
    main()
