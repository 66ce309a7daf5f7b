"""Synthetic world invariants: rendering, ground truth, temporal sim."""

import jax
import numpy as np

from aicamera_tpu.synthetic import (CLASS_IDS, TemporalWorld, WorldSpec,
                                    ground_truth, random_objects,
                                    random_scene, render)

SPEC = WorldSpec(hw=(216, 384), max_objects=6, presence=0.9)


def test_render_deterministic():
    k = jax.random.PRNGKey(3)
    f1, b1, c1, v1 = random_scene(k, SPEC)
    f2, b2, c2, v2 = random_scene(k, SPEC)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))
    assert np.array_equal(np.asarray(b1), np.asarray(b2))


def test_topmost_object_pixels_match_its_palette():
    """The last valid slot is topmost (z-order): its center pixel must be
    exactly one of its fill tones (or the darkened rim)."""
    ko, kr = jax.random.split(jax.random.PRNGKey(5))
    obj = random_objects(ko, SPEC)
    frame = np.asarray(render(obj, SPEC, kr)).astype(np.float32)
    valid = np.asarray(obj["valid"])
    assert valid.any()
    i = int(np.nonzero(valid)[0][-1])
    x1, y1, x2, y2 = np.asarray(obj["xyxy"])[i]
    h, w = SPEC.hw
    cx = int(np.clip((x1 + x2) / 2, 0, w - 1))
    cy = int(np.clip((y1 + y2) / 2, 0, h - 1))
    px = frame[cy, cx]
    cands = []
    for base in (np.asarray(obj["color"])[i], np.asarray(obj["color2"])[i]):
        cands.append(np.clip(np.round(base), 0, 255))
        cands.append(np.clip(np.round(base * 0.45), 0, 255))
    assert any(np.array_equal(px, c) for c in cands), (px, cands)


def test_ground_truth_clipped_and_classed():
    k = jax.random.PRNGKey(11)
    obj = random_objects(k, SPEC)
    boxes, cls, valid = (np.asarray(a) for a in ground_truth(obj, SPEC))
    h, w = SPEC.hw
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= w).all()
    assert (boxes[:, 1] >= 0).all() and (boxes[:, 3] <= h).all()
    assert set(cls.tolist()) <= set(CLASS_IDS)
    # mostly-offscreen objects are invalidated
    vis = np.asarray(obj["valid"])
    assert (valid <= vis).all()


def test_temporal_world_persistent_ids_and_motion():
    w = TemporalWorld(WorldSpec(hw=(216, 384), max_objects=5), seed=2)
    f0, b0, ids0, cls0, v0 = w.step()
    traj = [b0]
    for _ in range(12):
        f, b, ids, cls, v = w.step()
        assert np.array_equal(ids, ids0)
        assert np.array_equal(cls, cls0)
        traj.append(b)
    drift = np.abs(traj[-1] - traj[0]).mean()
    assert drift > 2.0, "objects should move"
    step_jump = max(np.abs(traj[i + 1] - traj[i]).max()
                    for i in range(len(traj) - 1))
    assert step_jump < 80.0, "motion should be smooth"
    assert f0.dtype == np.uint8 and f0.shape == (216, 384, 3)


def test_scene_is_jittable_and_batched():
    fn = jax.jit(jax.vmap(lambda k: random_scene(k, SPEC)))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    frames, boxes, cls, valid = fn(keys)
    assert frames.shape == (3, 216, 384, 3)
    assert boxes.shape == (3, SPEC.max_objects, 4)


def test_visibility_fraction_under_occlusion():
    """visibility() must report the z-order-owned pixel fraction: a box
    half-covered by a later slot reads ~0.5; the top slot reads 1.0."""
    import jax.numpy as jnp
    from aicamera_tpu.synthetic import WorldSpec, visibility

    spec = WorldSpec(hw=(100, 100), max_objects=2)
    objects = {
        "valid": jnp.array([True, True]),
        "cls": jnp.array([0, 0]),
        # slot 0: x 10..50; slot 1 overlaps its right half exactly
        "xyxy": jnp.array([[10.0, 10.0, 50.0, 50.0],
                           [30.0, 10.0, 70.0, 50.0]]),
        "color": jnp.zeros((2, 3)), "color2": jnp.zeros((2, 3)),
        "phase": jnp.zeros((2,)), "stripe": jnp.ones((2,)) * 8,
    }
    vis = np.asarray(visibility(objects, spec))
    assert abs(vis[0] - 0.5) < 0.02, vis
    assert vis[1] == 1.0, vis


def test_occlusion_aware_gt_drops_buried_objects():
    """With spec.occlusion_aware_gt, a slot fully painted over by a
    later slot is no longer ground truth; without the flag it is
    (legacy behavior, recorded benchmark numbers depend on it)."""
    import jax.numpy as jnp
    from aicamera_tpu.synthetic import WorldSpec, ground_truth

    objects = {
        "valid": jnp.array([True, True]),
        "cls": jnp.array([0, 2]),
        "xyxy": jnp.array([[20.0, 20.0, 40.0, 40.0],    # buried
                           [10.0, 10.0, 60.0, 60.0]]),  # covers it
        "color": jnp.zeros((2, 3)), "color2": jnp.zeros((2, 3)),
        "phase": jnp.zeros((2,)), "stripe": jnp.ones((2,)) * 8,
    }
    legacy = WorldSpec(hw=(100, 100), max_objects=2)
    _, _, v_legacy = ground_truth(objects, legacy)
    assert bool(v_legacy[0]) and bool(v_legacy[1])
    aware = WorldSpec(hw=(100, 100), max_objects=2,
                      occlusion_aware_gt=True)
    _, _, v_aware = ground_truth(objects, aware)
    assert not bool(v_aware[0]) and bool(v_aware[1])
