"""Clip self-training tests (train.py::make_clip_train_step /
finetune_on_clip, scripts/selftrain_clip.py::pseudo_labels) — tiny
shapes, CPU."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


# (cache-off fixture removed: conftest.py fork-isolates persistent-
# cache writes, so the AOT-serializer flake cannot kill the suite.)


def test_pseudo_labels_temporal_consistency_filter():
    """One-frame flickers are dropped; boxes with an adjacent-frame
    same-class IoU>=0.5 match survive; low-conf boxes never enter."""
    from selftrain_clip import pseudo_labels
    stable = np.array([10.0, 10.0, 50.0, 90.0], np.float32)
    drift = stable + np.array([3, 2, 3, 2], np.float32)
    flicker = np.array([200.0, 200.0, 260.0, 300.0], np.float32)
    lowconf = np.array([300.0, 50.0, 360.0, 150.0], np.float32)
    dets = [
        (np.stack([stable, lowconf]), np.array([0.9, 0.4], np.float32),
         np.array([0, 0])),
        (np.stack([drift, flicker]), np.array([0.8, 0.95], np.float32),
         np.array([0, 2])),
        (np.stack([stable]), np.array([0.7], np.float32), np.array([0])),
    ]
    boxes, cls, valid, stats = pseudo_labels(dets, conf_hi=0.5)
    assert valid.shape[0] == 3
    # frame 0: stable kept (matches frame 1's drifted box), lowconf out
    assert valid[0].sum() == 1
    np.testing.assert_array_equal(boxes[0, 0], stable)
    # frame 1: drift kept; the class-2 flicker has no adjacent match
    assert valid[1].sum() == 1
    np.testing.assert_array_equal(boxes[1, 0], drift)
    assert stats["kept_consistent"] == 3  # stable, drift, stable again


def test_pseudo_labels_class_must_match():
    """An adjacent-frame box of a DIFFERENT class does not validate."""
    from selftrain_clip import pseudo_labels
    b = np.array([[10.0, 10.0, 50.0, 90.0]], np.float32)
    dets = [
        (b, np.array([0.9], np.float32), np.array([0])),
        (b, np.array([0.9], np.float32), np.array([2])),
    ]
    _, _, valid, _ = pseudo_labels(dets, conf_hi=0.5)
    assert valid.sum() == 0


@pytest.mark.slow
def test_finetune_on_clip_runs_and_learns():
    """The clip fine-tune step runs end-to-end on CPU (mixed clip +
    synthetic batches, flip/photometric augmentation inside the scan)
    and moves the params."""
    import jax
    from aicamera_tpu.runtime.params import template_params, compute_dtype
    from aicamera_tpu.models import YOLOv8
    import jax.numpy as jnp
    from aicamera_tpu.synthetic import WorldSpec, TemporalWorld
    from aicamera_tpu.train import TrainConfig, finetune_on_clip

    spec = WorldSpec(hw=(96, 128), max_objects=3, presence=1.0)
    world = TemporalWorld(spec, seed=3, speed=2.0)
    frames, boxes, cls, valid = [], [], [], []
    m = 4
    for _ in range(6):
        f, b, ids, c, v = world.step()
        frames.append(f)
        bb = np.zeros((m, 4), np.float32)
        cc = np.zeros((m,), np.int32)
        vv = np.zeros((m,), bool)
        k = min(m, int(v.sum()))
        bb[:k] = b[v][:k]
        cc[:k] = c[v][:k]
        vv[:k] = True
        boxes.append(bb)
        cls.append(cc)
        valid.append(vv)

    model = YOLOv8(variant="n", num_classes=80, dtype=compute_dtype())
    params0 = template_params(model, jnp.zeros((1, 64, 64, 3),
                                               jnp.float32))
    cfg = TrainConfig(steps=4, batch=2, scan=2, lr=1e-3, warmup=1)
    _, params1 = finetune_on_clip(
        np.stack(frames), np.stack(boxes), np.stack(cls),
        np.stack(valid), params0, input_hw=(128, 128), cfg=cfg,
        synthetic_world=spec, synthetic_frac=0.5, log=lambda *_: None)
    # params moved and every leaf stayed finite
    moved = jax.tree.reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a.astype(jnp.float32)
                     - b.astype(jnp.float32), params0, params1), 0.0)
    assert moved > 0.0
    for leaf in jax.tree.leaves(params1):
        assert bool(jnp.all(jnp.isfinite(leaf)))
