"""Probe: is ``lax.approx_max_k(recall_target=1.0)`` an exact, tie-stable
drop-in for ``lax.top_k`` on this TPU, and does it speed up the fused
decode+NMS? (axon-safe methodology)."""

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

    b, a, k = 96, 8400, 300
    rng = np.random.default_rng(0)

    # --- exactness / tie-order check on tie-heavy data -----------------
    # scores quantized to a coarse grid (like bf16 sigmoids of untrained
    # logits): many exact ties.
    x = rng.choice(np.linspace(0.0, 1.0, 257), (b, a)).astype(np.float32)
    xd = jnp.asarray(x)
    s1, i1 = jax.jit(lambda v: lax.top_k(v, k))(xd)
    s2, i2 = jax.jit(
        lambda v: lax.approx_max_k(v, k, recall_target=1.0))(xd)
    s1, i1, s2, i2 = map(np.asarray, (s1, i1, s2, i2))
    print("values equal:", np.array_equal(s1, s2),
          " indices equal:", np.array_equal(i1, i2), flush=True)
    if not np.array_equal(i1, i2):
        row = np.nonzero((i1 != i2).any(1))[0][0]
        d = np.nonzero(i1[row] != i2[row])[0]
        print(f"  first diff row {row}, {len(d)} positions, e.g. pos {d[0]}:"
              f" top_k idx {i1[row, d[0]]} (score {s1[row, d[0]]})"
              f" vs approx idx {i2[row, d[0]]} (score {s2[row, d[0]]})",
              flush=True)

    # --- fused decode+NMS timing with each selector --------------------
    from aicamera_tpu.ops import nms as nms_mod

    level_hw = [(80, 80), (40, 40), (20, 20)]

    def fresh_levels(m=8):
        outs = []
        for j in range(m):
            key = jax.random.PRNGKey(j + 1)
            ks = jax.random.split(key, 6)
            lv = []
            kk = iter(ks)
            for (h, w) in level_hw:
                bb = jax.random.normal(next(kk), (b, h, w, 64),
                                       jnp.bfloat16) * 2
                cl = jax.random.normal(next(kk), (b, h, w, 80),
                                       jnp.bfloat16) * 3 - 2
                lv.append((bb, cl))
            outs.append((tuple(lv),))
        jax.block_until_ready(outs)
        return outs

    def fused(levels):
        return nms_mod.fused_decode_nms(levels, score_threshold=0.25,
                                        iou_threshold=0.5)

    t = measure(jax.jit(fused), fresh_levels())
    print(f"fused top_k        {t*1e3:9.3f} ms/chunk", flush=True)

    orig = lax.top_k
    try:
        lax_topk_approx = (
            lambda v, n: lax.approx_max_k(v, n, recall_target=1.0))
        nms_mod.lax.top_k = lax_topk_approx
        t = measure(jax.jit(lambda l: nms_mod.fused_decode_nms(
            l, score_threshold=0.25, iou_threshold=0.5)), fresh_levels())
        print(f"fused approx_max_k {t*1e3:9.3f} ms/chunk", flush=True)
    finally:
        nms_mod.lax.top_k = orig


if __name__ == "__main__":
    main()
