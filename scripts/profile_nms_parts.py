"""Micro-profile of the decode+NMS internals on the real device, using the
axon-safe methodology (distinct buffers, device_get sync — see
scripts/axon_timing.py)."""

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

    b, a, c, k = 96, 8400, 80, 300
    rng = np.random.default_rng(0)
    _salt = iter(range(1, 100000))

    def fresh(shape, dtype=np.float32, scale=1.0, m=10):
        """m distinct device buffers, generated ON DEVICE (the tunnel makes
        host uploads of GB-scale test data prohibitively slow)."""
        gen = jax.jit(lambda s: (
            jax.random.uniform(jax.random.PRNGKey(s), shape) * scale
        ).astype(dtype), static_argnums=())
        out = [(gen(jnp.uint32(next(_salt))),) for _ in range(m)]
        jax.block_until_ready(out)
        return out

    rows = []

    logits = [(x[0].astype(jnp.bfloat16),) for x in fresh((b, a, c))]
    f = jax.jit(lambda l: (jnp.max(l, -1), jnp.argmax(l, -1)))
    rows.append(("max+argmax C=80 bf16", measure(f, logits)))
    del logits

    for pool in (8400, 1024):
        kk = min(k, pool)
        f = jax.jit(lambda x, kk=kk: lax.top_k(x, kk))
        rows.append((f"top_k {pool}->{kk}", measure(f, fresh((b, pool)))))

    f = jax.jit(lambda x: lax.top_k(x, 100))
    rows.append(("top_k 300->100", measure(f, fresh((b, 300)))))

    bins = [(x[0].astype(jnp.bfloat16),) for x in fresh((b, a, 64))]
    idx = jnp.asarray(rng.integers(0, a, (b, k)).astype(np.int32))
    f = jax.jit(lambda bb: jnp.take_along_axis(bb, idx[..., None], axis=1))
    rows.append(("gather bins (B,300,64)", measure(f, bins)))

    f = jax.jit(lambda bb: jnp.sum(
        jax.nn.softmax(bb.astype(jnp.float32).reshape(b, -1, 4, 16), -1)
        * jnp.arange(16, dtype=jnp.float32), -1))
    rows.append(("DFL softmax 8400", measure(f, bins)))
    del bins

    from aicamera_tpu.ops.nms import _greedy_keep, _pairwise_iou_xyxy

    def iou_greedy(bx):
        def one(bb):
            ov = _pairwise_iou_xyxy(bb) > 0.5
            return _greedy_keep(ov, jnp.ones((k,), bool))
        return jax.vmap(one)(bx)
    rows.append(("KxK iou+greedy K=300",
                 measure(jax.jit(iou_greedy), fresh((b, k, 4), scale=600))))

    def iou_only(bx):
        return jax.vmap(lambda bb: _pairwise_iou_xyxy(bb) > 0.5)(bx)
    rows.append(("KxK iou only",
                 measure(jax.jit(iou_only), fresh((b, k, 4), scale=600))))

    print(f"{'part':<26}{'ms/chunk':>10}{'us/frame':>10}")
    for name, t in rows:
        print(f"{name:<26}{t * 1e3:>10.3f}{t * 1e6 / b:>10.2f}")


if __name__ == "__main__":
    main()
