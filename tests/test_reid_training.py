"""ReID contrastive training: loss semantics + trained-checkpoint margins.

The embedder's functional bar is the tracker's appearance gate
(``DEEPSORT_MAX_DIST = 0.2``, reference config.py:24): same-identity crop
pairs must embed inside it and cross-identity pairs well outside, or the
matching cascade either misses re-identifications or swaps identities.
``scripts/train_synthetic.py --reid`` enforces this at save time; the
checkpoint test here re-verifies it on the CPU backend.
"""

import numpy as np
import pytest
from pathlib import Path

REID_WEIGHTS = Path(__file__).resolve().parent.parent / \
    "models" / "reid" / "deepsort_reid_synthetic.msgpack"


def test_contrastive_loss_identity_alignment():
    """Perfectly aligned orthonormal views give the analytic InfoNCE loss."""
    import jax.numpy as jnp
    from aicamera_tpu.train import reid_contrastive_loss

    m, t = 4, 0.5
    za = zb = jnp.eye(m, dtype=jnp.float32)
    valid = jnp.ones((m,), bool)
    loss = float(reid_contrastive_loss(za, zb, valid, t))
    # each row: -log(e^{1/t} / (e^{1/t} + (m-1)e^{0})), both directions
    expected = -np.log(np.exp(1 / t) / (np.exp(1 / t) + (m - 1)))
    assert loss == pytest.approx(expected, rel=1e-5)


def test_contrastive_loss_prefers_aligned_views():
    """A swapped pairing must cost strictly more than the true pairing."""
    import jax
    import jax.numpy as jnp
    from aicamera_tpu.train import reid_contrastive_loss

    key = jax.random.PRNGKey(0)
    za = jax.random.normal(key, (6, 32))
    za = za / jnp.linalg.norm(za, axis=-1, keepdims=True)
    valid = jnp.ones((6,), bool)
    aligned = float(reid_contrastive_loss(za, za, valid, 0.1))
    swapped = float(reid_contrastive_loss(za, jnp.roll(za, 1, axis=0),
                                          valid, 0.1))
    assert aligned < swapped


def test_contrastive_loss_masks_invalid_slots():
    """Invalid slots contribute nothing: loss over {valid} == loss with
    extra garbage-filled invalid slots appended."""
    import jax
    import jax.numpy as jnp
    from aicamera_tpu.train import reid_contrastive_loss

    key = jax.random.PRNGKey(1)
    za = jax.random.normal(key, (3, 16))
    za = za / jnp.linalg.norm(za, axis=-1, keepdims=True)
    small = float(reid_contrastive_loss(
        za, za, jnp.ones((3,), bool), 0.2))
    pad = jnp.concatenate([za, jnp.full((2, 16), 7.0)], axis=0)
    masked = float(reid_contrastive_loss(
        pad, pad, jnp.asarray([True, True, True, False, False]), 0.2))
    assert masked == pytest.approx(small, rel=1e-5)


@pytest.mark.skipif(not REID_WEIGHTS.exists(),
                    reason="ReID checkpoint not trained "
                           "(scripts/train_synthetic.py --reid)")
def test_trained_embedder_separates_identities():
    """Two renderings of the same scene: same-instance cosine distance
    inside the 0.2 appearance gate, cross-instance well outside."""
    import jax
    import jax.numpy as jnp
    from aicamera_tpu.ops.crops import extract_reid_crops
    from aicamera_tpu.runtime.params import resolve_reid_params
    from aicamera_tpu.synthetic import (WorldSpec, ground_truth,
                                        random_objects, render)

    model, params = resolve_reid_params(weights_path=str(REID_WEIGHTS))
    world = WorldSpec(max_objects=6, presence=1.0)
    key = jax.random.PRNGKey(42)
    ko, ka, kb = jax.random.split(key, 3)
    obj = random_objects(ko, world)
    boxes, _, valid = ground_truth(obj, world)
    ca, va = extract_reid_crops(render(obj, world, ka), boxes,
                                compute_dtype=jnp.float32)
    cb, vb = extract_reid_crops(render(obj, world, kb), boxes,
                                compute_dtype=jnp.float32)
    za = np.asarray(model.apply(params, ca), np.float32)
    zb = np.asarray(model.apply(params, cb), np.float32)
    v = np.asarray(valid & va & vb)
    d = 1.0 - za @ zb.T
    idx = np.nonzero(v)[0]
    assert len(idx) >= 3
    intra = d[idx, idx]
    inter = np.asarray([d[i, j] for i in idx for j in idx if i != j])
    assert intra.max() < 0.2, "same identity outside the appearance gate"
    # The synthetic world can draw genuine look-alikes (same class,
    # near-identical color/stripe), so a hard floor on ALL cross pairs is
    # not a property of the embedder. What association needs is ranking:
    # every instance's true match must beat every impostor, and typical
    # impostors must sit far outside the gate.
    for i in idx:
        impostors = d[i, idx[idx != i]]
        assert d[i, i] < impostors.min(), f"impostor beats true match @{i}"
    assert np.median(inter) > 0.3, "typical impostor inside/near the gate"
