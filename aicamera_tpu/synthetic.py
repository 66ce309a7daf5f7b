"""Synthetic tracking world: procedurally generated scenes with ground truth.

The reference repo can only be *functionally* validated with its downloaded
weight files (``scripts/download_models.sh``), which require network access.
This module removes that dependency: it generates detection/tracking scenes
with exact ground truth — class-styled rectangles with per-instance
appearance over a textured background — so the framework can

- **train** its YOLOv8 implementation to competence on-device
  (:mod:`aicamera_tpu.train`), proving the detect path end to end,
- **regression-test** detection + tracking functionally (precision/recall,
  MOTA, ID stability) without any external weights, and
- **benchmark** under a realistic detection load (the untrained-weights
  headline caveat of round 1).

Rendering is pure ``jax.numpy`` so scene synthesis runs ON DEVICE inside
the jitted train step (zero host→device traffic per step — the tunneled
runtime makes host uploads the bottleneck otherwise, see CLAUDE.md), and
identically on the CPU backend for hardware-free tests.

Object classes mirror the reference's tracked set
(``config.CLASSES_TO_TRACK``: person/car/motorcycle/bus/truck) with
class-characteristic aspect ratios, sizes, and color families, so class
prediction is learnable. Each instance carries a random two-tone stripe
pattern and shade — distinct appearance for ReID.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Tracked classes (reference config.py:53): COCO ids.
CLASS_IDS = (0, 2, 3, 5, 7)          # person, car, motorcycle, bus, truck

# Per-class priors: (h_min, h_max, aspect_min, aspect_max) in source pixels
# (aspect = w / h). Size ranges chosen so every class spans at least two
# FPN levels after the 960x540 -> 640x640 letterbox (ratio 2/3).
_PRIORS = {
    0: (70, 220, 0.25, 0.45),        # person: tall, thin
    2: (45, 130, 1.6, 2.6),          # car: wide, low
    3: (50, 120, 0.5, 0.9),          # motorcycle
    5: (90, 240, 1.8, 3.0),          # bus: very wide, tall
    7: (80, 220, 1.5, 2.5),          # truck
}

# Class color families, BGR base and per-channel jitter span. Chosen far
# apart so color alone identifies the class family; per-instance jitter
# plus the stripe pattern distinguishes instances.
_COLORS = {
    0: ((40, 40, 200), (40, 40, 55)),     # person: red
    2: ((200, 90, 40), (55, 50, 40)),     # car: blue
    3: ((200, 60, 200), (55, 40, 55)),    # motorcycle: magenta
    5: ((50, 190, 60), (40, 60, 40)),     # bus: green
    7: ((40, 190, 200), (40, 60, 55)),    # truck: yellow
}

# NumPy (not jnp): module-level jnp.asarray would initialize the JAX
# backend at import time, before callers can force a platform (CLAUDE.md).
_CLS_TABLE = np.asarray(CLASS_IDS, np.int32)
_PRIOR_TABLE = np.asarray([_PRIORS[c] for c in CLASS_IDS], np.float32)
_COLOR_BASE = np.asarray([_COLORS[c][0] for c in CLASS_IDS], np.float32)
_COLOR_SPAN = np.asarray([_COLORS[c][1] for c in CLASS_IDS], np.float32)


@dataclasses.dataclass(frozen=True)
class WorldSpec:
    """Static scene configuration (shapes baked into the jitted renderer)."""
    hw: Tuple[int, int] = (540, 960)
    max_objects: int = 12
    presence: float = 0.75            # probability a slot holds an object
    noise: float = 12.0               # background noise amplitude (levels)
    # Occlusion-aware ground truth: also invalidate objects whose
    # VISIBLE (z-order-owned) pixel fraction falls below the
    # ground_truth min_visible threshold — the MOTChallenge-style
    # visibility filter. Essential for crowd worlds (~72 objects at
    # presence 0.75 leave many slots almost fully painted over; counting
    # them as gt puts an unlearnable, untrackable floor under every
    # recall number). Off by default: sparse-world configs keep their
    # recorded numbers bit-for-bit.
    occlusion_aware_gt: bool = False
    # Object size multiplier on the class priors. Crowd worlds need < 1:
    # at the default sizes, 96 objects carry ~1.8x the frame's area in
    # boxes, so mutual z-order occlusion buries most of them (measured
    # 23.7 visible of ~72 present); halving linear size quarters the
    # area and lets a genuine 60+ objects stay visible concurrently.
    size_scale: float = 1.0


@partial(jax.jit, static_argnames=("spec",))
def random_objects(key, spec: WorldSpec):
    """Sample one scene's object slots. Returns a dict of (N,) arrays:
    ``valid, cls (index into CLASS_IDS), xyxy (N,4) source-pixel boxes,
    color/color2 (N,3), phase (N,), stripe (N,)``.

    Boxes may extend up to 25% beyond the frame edge (partial visibility,
    like real camera scenes); downstream ground truth clips to the frame.

    Jitted as ONE program (spec static): eager per-op dispatch here both
    wastes round trips and, on slow hosts, pushes tiny binary-op programs
    over the persistent cache's compile-time floor — and one of those
    segfaults XLA's CPU executable serializer (see tests/conftest.py).
    """
    h, w = spec.hw
    n = spec.max_objects
    ks = jax.random.split(key, 8)
    valid = jax.random.bernoulli(ks[0], spec.presence, (n,))
    ci = jax.random.randint(ks[1], (n,), 0, len(CLASS_IDS))
    pri = jnp.asarray(_PRIOR_TABLE)[ci]                      # (N, 4)
    u = jax.random.uniform(ks[2], (n, 2))
    bh = (pri[:, 0] + u[:, 0] * (pri[:, 1] - pri[:, 0])) * spec.size_scale
    bw = bh * (pri[:, 2] + u[:, 1] * (pri[:, 3] - pri[:, 2]))
    c = jax.random.uniform(ks[3], (n, 2))
    cx = c[:, 0] * (w + 0.5 * bw) - 0.25 * bw
    cy = c[:, 1] * (h + 0.5 * bh) - 0.25 * bh
    xyxy = jnp.stack([cx - bw / 2, cy - bh / 2,
                      cx + bw / 2, cy + bh / 2], axis=-1)
    jit1 = jax.random.uniform(ks[4], (n, 3), minval=-1.0, maxval=1.0)
    jit2 = jax.random.uniform(ks[5], (n, 3), minval=-1.0, maxval=1.0)
    color = jnp.clip(jnp.asarray(_COLOR_BASE)[ci]
                     + jit1 * jnp.asarray(_COLOR_SPAN)[ci], 0, 255)
    color2 = jnp.clip(color * (0.55 + 0.25 * jit2), 0, 255)
    phase = jax.random.uniform(ks[6], (n,), maxval=64.0)
    stripe = jax.random.randint(ks[7], (n,), 6, 18).astype(jnp.float32)
    return {"valid": valid, "cls": ci, "xyxy": xyxy, "color": color,
            "color2": color2, "phase": phase, "stripe": stripe}


def render(objects, spec: WorldSpec, key) -> jnp.ndarray:
    """Rasterize one scene to a (H, W, 3) uint8 BGR frame, on device.

    Later slots paint over earlier ones (z-order = slot order), giving
    natural partial occlusion. Each object: striped two-tone fill with a
    darker 2px rim (sharp edges for box regression to latch onto).
    Background: random linear gradient + uniform noise.
    """
    h, w = spec.hw
    n = spec.max_objects
    kg, kn = jax.random.split(key)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]

    g = jax.random.uniform(kg, (8,))
    base = 90.0 + 70.0 * g[:3]                                # (3,) BGR
    gx = (g[3:6] - 0.5) * (60.0 / w)
    gy = (g[6:8].sum() - 1.0) * (60.0 / h)
    bg = (base[None, None, :] + (gx[None, None, :] * xx[..., None])
          + gy * yy[..., None])
    bg = bg + jax.random.uniform(kn, (h, w, 1), minval=-spec.noise,
                                 maxval=spec.noise)

    x1, y1 = objects["xyxy"][:, 0], objects["xyxy"][:, 1]
    x2, y2 = objects["xyxy"][:, 2], objects["xyxy"][:, 3]
    inside = ((xx[None] >= x1[:, None, None])
              & (xx[None] < x2[:, None, None])
              & (yy[None] >= y1[:, None, None])
              & (yy[None] < y2[:, None, None])
              & objects["valid"][:, None, None])              # (N, H, W)

    # Ownership: highest-index valid object covering the pixel. Pattern and
    # rim are computed AFTER ownership on the (H, W) grid — materializing
    # them per object (N, H, W) triples the renderer's memory traffic
    # (matters inside the train step, where rendering shares the dispatch
    # with forward+backward).
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None]
    owner = jnp.max(jnp.where(inside, idx, 0), axis=0)        # (H, W)
    own = owner - 1                                           # -1 = bg
    sel = jnp.clip(own, 0, n - 1)
    c1 = objects["color"][sel]                                # (H, W, 3)
    c2 = objects["color2"][sel]
    t = jnp.floor((xx + objects["phase"][sel])
                  / objects["stripe"][sel]) % 2.0             # (H, W)
    r = ((xx < x1[sel] + 2.0) | (xx >= x2[sel] - 2.0)
         | (yy < y1[sel] + 2.0) | (yy >= y2[sel] - 2.0))
    fill = jnp.where(t[..., None] > 0, c2, c1)
    fill = jnp.where(r[..., None], fill * 0.45, fill)
    frame = jnp.where((own >= 0)[..., None], fill, bg)
    return jnp.clip(jnp.round(frame), 0, 255).astype(jnp.uint8)


def visibility(objects, spec: WorldSpec) -> jnp.ndarray:
    """Per-slot VISIBLE pixel fraction under z-order occlusion: pixels
    the slot actually owns in the rendered frame / its in-frame box
    pixels. Same ownership math as :func:`render` (highest-index valid
    slot wins each pixel). (N,) float in [0, 1]; 0 for invalid slots."""
    h, w = spec.hw
    n = spec.max_objects
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    x1, y1 = objects["xyxy"][:, 0], objects["xyxy"][:, 1]
    x2, y2 = objects["xyxy"][:, 2], objects["xyxy"][:, 3]
    inside = ((xx[None] >= x1[:, None, None])
              & (xx[None] < x2[:, None, None])
              & (yy[None] >= y1[:, None, None])
              & (yy[None] < y2[:, None, None])
              & objects["valid"][:, None, None])              # (N, H, W)
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None]
    owner = jnp.max(jnp.where(inside, idx, 0), axis=0)        # (H, W)
    owned = jnp.sum((owner[None] == idx).astype(jnp.float32), axis=(1, 2))
    in_frame = jnp.sum(inside.astype(jnp.float32), axis=(1, 2))
    return owned / jnp.maximum(in_frame, 1.0)


def ground_truth(objects, spec: WorldSpec, min_visible: float = 0.25):
    """Frame-clipped gt boxes: (xyxy (N,4), cls_coco (N,), valid (N,)).

    Slots whose clipped area is below ``min_visible`` of the full box
    are marked invalid, mirroring how a labeler drops barely visible
    objects. With ``spec.occlusion_aware_gt`` the same ``min_visible``
    threshold additionally applies to the z-order VISIBLE fraction
    (:func:`visibility`) — the MOTChallenge-style filter crowd worlds
    need (off by default; partial occlusion stays unfiltered in the
    sparse worlds, as in practice).
    """
    h, w = spec.hw
    b = objects["xyxy"]
    cl = jnp.stack([jnp.clip(b[:, 0], 0, w), jnp.clip(b[:, 1], 0, h),
                    jnp.clip(b[:, 2], 0, w), jnp.clip(b[:, 3], 0, h)],
                   axis=-1)
    area = jnp.maximum(b[:, 2] - b[:, 0], 1e-6) * \
        jnp.maximum(b[:, 3] - b[:, 1], 1e-6)
    carea = jnp.maximum(cl[:, 2] - cl[:, 0], 0) * \
        jnp.maximum(cl[:, 3] - cl[:, 1], 0)
    valid = objects["valid"] & (carea / area >= min_visible)
    if spec.occlusion_aware_gt:
        valid = valid & (visibility(objects, spec) >= min_visible)
    return cl, jnp.asarray(_CLS_TABLE)[objects["cls"]], valid


def random_scene(key, spec: WorldSpec):
    """One-call scene: (frame_u8, gt_xyxy, gt_cls, gt_valid). Jittable."""
    ko, kr = jax.random.split(key)
    obj = random_objects(ko, spec)
    frame = render(obj, spec, kr)
    boxes, cls, valid = ground_truth(obj, spec)
    return frame, boxes, cls, valid


class TemporalWorld:
    """Host-side temporal simulator for tracking tests and demos.

    Objects move with constant velocity plus small acceleration noise and
    bounce off frame edges; identities persist (the ground-truth track id
    is the slot index). Rendering reuses :func:`render` (CPU backend in
    tests), so appearance is identical to the training distribution.
    """

    def __init__(self, spec: WorldSpec = WorldSpec(), seed: int = 0,
                 speed: float = 4.0):
        self.spec = spec
        self.speed = speed
        self._rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(self._rng.integers(2**31))
        self.obj = {k: np.array(v)  # writable copies (np.asarray of a jax
                    for k, v in random_objects(key, spec).items()}  # array is read-only)
        n = spec.max_objects
        self.vel = self._rng.normal(0.0, speed, (n, 2)).astype(np.float32)
        self._frame_keys = jax.random.split(
            jax.random.PRNGKey(self._rng.integers(2**31)), 4096)
        # One jitted program per frame (render + ground truth fused) instead
        # of dozens of eager dispatches; outputs come back in one
        # device_get batch. Matters on the tunneled TPU runtime, where
        # per-dispatch/per-transfer overhead dominates (CLAUDE.md).
        self._render_gt = jax.jit(
            lambda obj, key: (render(obj, self.spec, key),
                              *ground_truth(obj, self.spec)))
        self.t = 0

    def step(self):
        """Advance one frame; returns (frame_u8, gt_xyxy, gt_ids, gt_cls,
        gt_valid) as numpy arrays."""
        h, w = self.spec.hw
        b = self.obj["xyxy"]
        self.vel += self._rng.normal(0.0, 0.3, self.vel.shape).astype(
            np.float32)
        self.vel = np.clip(self.vel, -2.5 * self.speed, 2.5 * self.speed)
        b[:, 0::2] += self.vel[:, :1]
        b[:, 1::2] += self.vel[:, 1:]
        # bounce: reflect velocity when the box center exits the frame
        cx = (b[:, 0] + b[:, 2]) / 2
        cy = (b[:, 1] + b[:, 3]) / 2
        self.vel[:, 0] = np.where((cx < 0) | (cx > w),
                                  -self.vel[:, 0], self.vel[:, 0])
        self.vel[:, 1] = np.where((cy < 0) | (cy > h),
                                  -self.vel[:, 1], self.vel[:, 1])
        obj_j = {k: jnp.asarray(v) for k, v in self.obj.items()}
        frame, boxes, cls, valid = jax.device_get(
            self._render_gt(obj_j, self._frame_keys[self.t % 4096]))
        ids = np.arange(1, self.spec.max_objects + 1)
        self.t += 1
        return frame, boxes, ids, cls, valid
