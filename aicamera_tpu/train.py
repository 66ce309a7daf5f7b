"""Minimal on-device detection trainer for the synthetic world.

The reference ships no training code — its detector competence comes from
downloaded weights (``scripts/download_models.sh``), unavailable without
network access. This trainer closes the loop natively: YOLOv8 (the same
Flax modules the inference path uses, :mod:`aicamera_tpu.models.yolov8`)
is trained to competence on :mod:`aicamera_tpu.synthetic` scenes, proving
the full detect path (preprocess → backbone → DFL decode → NMS → track)
functionally, with zero external inputs.

TPU-native structure:
- scene synthesis, letterbox preprocess, forward, loss, and the optimizer
  update all run inside ONE jitted program; ``lax.scan`` folds many steps
  per dispatch (the tunneled runtime's per-dispatch overhead would
  otherwise dominate — CLAUDE.md);
- no host→device training data at all: scenes are rendered on device from
  PRNG keys.

Assignment is deliberately simple (one positive anchor per ground-truth
box: the center cell at an FPN level chosen by box size) — a distillation
of the YOLOv8 task-aligned assigner sufficient for the synthetic world.
Losses: BCE classification over all anchors, distribution-focal loss on
the two adjacent bins, and expected-box IoU loss (all standard YOLOv8
components).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.yolov8 import REG_MAX, STRIDES
from .ops.preprocess import LetterboxSpec, preprocess_yolo
from .synthetic import WorldSpec, random_objects, render, ground_truth

# FPN level selection thresholds on max(w, h) in letterbox pixels. The
# center-cell DFL reach at level l is REG_MAX * stride_l per side, so each
# threshold keeps targets comfortably inside the bin range.
_LEVEL_MAX_SIZE = (80.0, 160.0)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch: int = 8
    steps: int = 3000
    scan: int = 25                  # optimizer steps fused per dispatch
    lr: float = 2e-3
    warmup: int = 200
    weight_decay: float = 1e-5
    w_cls: float = 1.0
    w_iou: float = 2.5
    w_dfl: float = 0.4
    seed: int = 0


def _level_tables(input_hw: Tuple[int, int]):
    """Static per-level (H, W, base anchor offset) tables."""
    lh = [(input_hw[0] // s, input_hw[1] // s) for s in STRIDES]
    bases, b = [], 0
    for (h, w) in lh:
        bases.append(b)
        b += h * w
    return lh, bases, b


def build_targets(gt_xyxy, gt_cls, gt_valid, spec: LetterboxSpec,
                  input_hw: Tuple[int, int], num_classes: int = 80):
    """Per-image dense targets from source-pixel ground truth.

    Returns (cls_t (A, C), box_t (A, 4) ltrb in stride units, pos (A,)).
    One positive anchor per gt: the center cell at the size-selected level.
    Anchor collisions resolve by max (cls) / last-write (box).
    """
    lh, bases, a_total = _level_tables(input_hw)
    r = spec.ratio
    # source -> letterbox coords
    x1 = gt_xyxy[:, 0] * r + spec.left
    y1 = gt_xyxy[:, 1] * r + spec.top
    x2 = gt_xyxy[:, 2] * r + spec.left
    y2 = gt_xyxy[:, 3] * r + spec.top
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    size = jnp.maximum(x2 - x1, y2 - y1)
    level = ((size > _LEVEL_MAX_SIZE[0]).astype(jnp.int32)
             + (size > _LEVEL_MAX_SIZE[1]).astype(jnp.int32))

    strides = jnp.asarray(STRIDES, jnp.float32)[level]
    lw = jnp.asarray([w for (_, w) in lh], jnp.int32)[level]
    lhh = jnp.asarray([h for (h, _) in lh], jnp.int32)[level]
    base = jnp.asarray(bases, jnp.int32)[level]
    ci = jnp.clip((cx / strides).astype(jnp.int32), 0, lw - 1)
    cj = jnp.clip((cy / strides).astype(jnp.int32), 0, lhh - 1)
    anchor = base + cj * lw + ci
    # centers of the chosen cells, letterbox pixels
    acx = (ci.astype(jnp.float32) + 0.5) * strides
    acy = (cj.astype(jnp.float32) + 0.5) * strides
    ltrb = jnp.stack([(acx - x1), (acy - y1), (x2 - acx), (y2 - acy)],
                     axis=-1) / strides[:, None]
    ltrb = jnp.clip(ltrb, 0.0, REG_MAX - 1.01)

    ok = gt_valid & (x2 > x1 + 1) & (y2 > y1 + 1)
    # invalid gts scatter to a dump row (a_total) that is sliced off
    tgt = jnp.where(ok, anchor, a_total)
    cls_t = jnp.zeros((a_total + 1, num_classes), jnp.float32)
    cls_t = cls_t.at[tgt, gt_cls].max(1.0)[:a_total]
    box_t = jnp.zeros((a_total + 1, 4), jnp.float32)
    box_t = box_t.at[tgt].set(ltrb)[:a_total]
    pos = jnp.zeros((a_total + 1,), jnp.bool_).at[tgt].set(ok)[:a_total]
    return cls_t, box_t, pos


def detection_loss(level_outputs, cls_t, box_t, pos, cfg: TrainConfig):
    """Per-image loss from raw head outputs and dense targets."""
    nbins = 4 * REG_MAX
    bins = jnp.concatenate(
        [bb.reshape(-1, nbins) for bb, _ in level_outputs], axis=0)
    logits = jnp.concatenate(
        [cl.reshape(-1, cl.shape[-1]) for _, cl in level_outputs],
        axis=0).astype(jnp.float32)

    npos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
    bce = optax.sigmoid_binary_cross_entropy(logits, cls_t)
    loss_cls = jnp.sum(bce) / npos

    b = bins.astype(jnp.float32).reshape(-1, 4, REG_MAX)
    logp = jax.nn.log_softmax(b, axis=-1)
    lo = jnp.floor(box_t).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, REG_MAX - 1)
    wl = (hi.astype(jnp.float32) - box_t)
    wr = 1.0 - wl
    ce = -(wl * jnp.take_along_axis(logp, lo[..., None], -1)[..., 0]
           + wr * jnp.take_along_axis(logp, hi[..., None], -1)[..., 0])
    loss_dfl = jnp.sum(jnp.where(pos[:, None], ce, 0.0)) / npos

    dist = jnp.sum(jax.nn.softmax(b, axis=-1)
                   * jnp.arange(REG_MAX, dtype=jnp.float32), -1)  # (A, 4)
    # IoU of predicted vs target ltrb around the same center (stride units)
    iw = jnp.minimum(dist[:, 0], box_t[:, 0]) + \
        jnp.minimum(dist[:, 2], box_t[:, 2])
    ih = jnp.minimum(dist[:, 1], box_t[:, 1]) + \
        jnp.minimum(dist[:, 3], box_t[:, 3])
    inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
    area_p = jnp.maximum(dist[:, 0] + dist[:, 2], 0) * \
        jnp.maximum(dist[:, 1] + dist[:, 3], 0)
    area_t = (box_t[:, 0] + box_t[:, 2]) * (box_t[:, 1] + box_t[:, 3])
    iou = inter / jnp.maximum(area_p + area_t - inter, 1e-7)
    loss_iou = jnp.sum(jnp.where(pos, 1.0 - iou, 0.0)) / npos

    return (cfg.w_cls * loss_cls + cfg.w_iou * loss_iou
            + cfg.w_dfl * loss_dfl,
            {"cls": loss_cls, "iou": loss_iou, "dfl": loss_dfl})


def make_train_step(model, world: WorldSpec, spec: LetterboxSpec,
                    input_hw: Tuple[int, int], cfg: TrainConfig, tx):
    """Build the jitted multi-step train function (scan of cfg.scan steps,
    scenes rendered on device)."""

    def one_image_loss(params, key):
        ko, kr = jax.random.split(key)
        obj = random_objects(ko, world)
        frame = render(obj, world, kr)
        gt_xyxy, gt_cls, gt_valid = ground_truth(obj, world)
        x = preprocess_yolo(frame, spec, out_dtype=model.dtype)[0]
        levels = model.apply(params, x[None])
        cls_t, box_t, pos = build_targets(
            gt_xyxy, gt_cls, gt_valid, spec, input_hw)
        return detection_loss(levels, cls_t, box_t, pos, cfg)

    def batch_loss(params, key):
        keys = jax.random.split(key, cfg.batch)
        loss, aux = jax.vmap(
            lambda k: one_image_loss(params, k))(keys)
        return jnp.mean(loss), jax.tree.map(jnp.mean, aux)

    grad_fn = jax.value_and_grad(batch_loss, has_aux=True)

    def one_step(carry, key):
        params, opt_state = carry
        (loss, aux), grads = grad_fn(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (loss, aux)

    @jax.jit
    def multi_step(params, opt_state, key):
        keys = jax.random.split(key, cfg.scan)
        (params, opt_state), (losses, auxes) = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses, auxes

    return multi_step


def make_train_step_dp(model, world: WorldSpec, spec: LetterboxSpec,
                       input_hw: Tuple[int, int], cfg: TrainConfig, tx,
                       mesh, axis: str = "batch"):
    """Data-parallel variant of :func:`make_train_step` over a mesh axis.

    The per-step batch (scenes rendered on device from PRNG keys) is
    GSPMD-sharded over ``mesh``'s ``axis``: each device renders and
    forward/backwards its shard, and XLA inserts the one gradient
    all-reduce implied by the batch-mean (riding ICI on a real slice —
    the canonical pjit data-parallel recipe; no explicit collectives,
    no pmap). Params and optimizer state stay replicated.

    Returns a jitted ``multi_step(params, opt_state, key)`` with the same
    contract as :func:`make_train_step`. ``cfg.batch`` must divide evenly
    over the axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_shard = mesh.shape[axis]
    if cfg.batch % n_shard:
        raise ValueError(
            f"cfg.batch={cfg.batch} not divisible by mesh axis "
            f"'{axis}' size {n_shard}")
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))

    def one_image_loss(params, key):
        ko, kr = jax.random.split(key)
        obj = random_objects(ko, world)
        frame = render(obj, world, kr)
        gt_xyxy, gt_cls, gt_valid = ground_truth(obj, world)
        x = preprocess_yolo(frame, spec, out_dtype=model.dtype)[0]
        levels = model.apply(params, x[None])
        cls_t, box_t, pos = build_targets(
            gt_xyxy, gt_cls, gt_valid, spec, input_hw)
        return detection_loss(levels, cls_t, box_t, pos, cfg)

    def batch_loss(params, key):
        keys = jax.random.split(key, cfg.batch)
        # shard the example axis: everything derived from a key (scene,
        # forward, per-example loss) lands on that key's device
        keys = jax.lax.with_sharding_constraint(keys, batch_sharded)
        loss, aux = jax.vmap(lambda k: one_image_loss(params, k))(keys)
        return jnp.mean(loss), jax.tree.map(jnp.mean, aux)

    grad_fn = jax.value_and_grad(batch_loss, has_aux=True)

    def one_step(carry, key):
        params, opt_state = carry
        (loss, aux), grads = grad_fn(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (loss, aux)

    def multi_step(params, opt_state, key):
        keys = jax.random.split(key, cfg.scan)
        (params, opt_state), (losses, auxes) = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses, auxes

    return jax.jit(
        multi_step,
        in_shardings=(replicated, replicated, replicated),
        out_shardings=(replicated, replicated, replicated, replicated))


@dataclasses.dataclass(frozen=True)
class ReIDTrainConfig:
    scenes: int = 4                 # scenes per step (each x2 views)
    # 2500 (~9 min on one v5e): 1500 lands the inter-identity p5 cosine
    # distance at ~0.30, uncomfortably close to the save gate; 2500
    # measures ~0.40 with intra_p95 ~0.0005
    steps: int = 2500
    scan: int = 25
    lr: float = 1e-3
    warmup: int = 100
    weight_decay: float = 1e-5
    temperature: float = 0.1
    jitter: float = 0.06            # box jitter fraction of extent
    erase_max: float = 0.5          # max occluder fraction per crop axis
    photometric: float = 0.15       # brightness/contrast jitter span
    seed: int = 0


def reid_contrastive_loss(za, zb, valid, temperature: float):
    """Bidirectional InfoNCE over two views of M instances.

    ``za, zb`` are L2-normalized (M, D) embeddings of the same instances
    under different rendering/crop noise; ``valid`` masks empty slots.
    Every other valid instance (any scene) is a negative.
    """
    sim = (za @ zb.T) / temperature                  # (M, M)
    neg_inf = jnp.asarray(-1e9, sim.dtype)
    sim = jnp.where(valid[None, :], sim, neg_inf)
    sim_t = jnp.where(valid[:, None], sim, neg_inf)
    diag = jnp.arange(sim.shape[0])
    ce_ab = -(jax.nn.log_softmax(sim, axis=1)[diag, diag])
    ce_ba = -(jax.nn.log_softmax(sim_t, axis=0)[diag, diag])
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid, ce_ab + ce_ba, 0.0)) / (2.0 * n)


def make_reid_train_step(model, world: WorldSpec, cfg: ReIDTrainConfig, tx):
    """Jitted multi-step ReID trainer: per step, render each scene twice
    (different background/noise), gather the gt crops on device with the
    production crop extractor, embed, and pull view pairs together."""
    from .ops.crops import extract_reid_crops

    def random_erase(key, crops):
        """Occlude a random rectangle per crop (fill = 0 == ImageNet mean
        post-normalization). Tracking's hard failure mode is a crossing
        object corrupting the crop — measured as identity switches when
        the un-augmented embedder meets overlapping instances — so the
        positive pairs must survive partial occlusion."""
        n, ch, cw = crops.shape[0], crops.shape[1], crops.shape[2]
        kc, ks = jax.random.split(key)
        ctr = jax.random.uniform(kc, (n, 2))
        size = jax.random.uniform(ks, (n, 2), minval=0.1,
                                  maxval=cfg.erase_max)
        yy = jnp.arange(ch, dtype=jnp.float32)[None, :] / ch
        xx = jnp.arange(cw, dtype=jnp.float32)[None, :] / cw
        in_y = jnp.abs(yy - ctr[:, :1]) < size[:, :1] / 2   # (n, ch)
        in_x = jnp.abs(xx - ctr[:, 1:]) < size[:, 1:] / 2   # (n, cw)
        hole = in_y[:, :, None] & in_x[:, None, :]          # (n, ch, cw)
        return jnp.where(hole[..., None], 0.0, crops)

    def photometric(key, crops):
        """Per-crop brightness/contrast jitter (on normalized values)."""
        kg, kb_ = jax.random.split(key)
        span = cfg.photometric
        gain = 1.0 + jax.random.uniform(kg, (crops.shape[0], 1, 1, 1),
                                        minval=-span, maxval=span)
        bias = jax.random.uniform(kb_, (crops.shape[0], 1, 1, 1),
                                  minval=-span, maxval=span)
        return (crops * gain.astype(crops.dtype)
                + bias.astype(crops.dtype))

    def scene_views(key):
        ko, ka, kb, kj, ke, kp = jax.random.split(key, 6)
        obj = random_objects(ko, world)
        boxes, _, valid = ground_truth(obj, world)
        fa = render(obj, world, ka)
        fb = render(obj, world, kb)
        ext = jnp.stack([boxes[:, 2] - boxes[:, 0],
                         boxes[:, 3] - boxes[:, 1],
                         boxes[:, 2] - boxes[:, 0],
                         boxes[:, 3] - boxes[:, 1]], axis=-1)
        jit_b = boxes + cfg.jitter * ext * jax.random.normal(
            kj, boxes.shape)
        ca, va = extract_reid_crops(fa, boxes, compute_dtype=model.dtype)
        cb, vb = extract_reid_crops(fb, jit_b, compute_dtype=model.dtype)
        cb = photometric(kp, random_erase(ke, cb))
        return ca, cb, valid & va & vb

    def batch_loss(params, key):
        keys = jax.random.split(key, cfg.scenes)
        ca, cb, valid = jax.vmap(scene_views)(keys)
        m = cfg.scenes * world.max_objects
        ca = ca.reshape(m, *ca.shape[2:])
        cb = cb.reshape(m, *cb.shape[2:])
        valid = valid.reshape(m)
        za = model.apply(params, ca).astype(jnp.float32)
        zb = model.apply(params, cb).astype(jnp.float32)
        return reid_contrastive_loss(za, zb, valid, cfg.temperature)

    grad_fn = jax.value_and_grad(batch_loss)

    def one_step(carry, key):
        params, opt_state = carry
        loss, grads = grad_fn(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def multi_step(params, opt_state, key):
        keys = jax.random.split(key, cfg.scan)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses

    return multi_step


def make_clip_train_step(model, spec: LetterboxSpec,
                         input_hw: Tuple[int, int],
                         cfg: TrainConfig, tx,
                         synthetic_world: WorldSpec | None = None,
                         synthetic_frac: float = 0.5):
    """Self-training step over a REAL pre-staged clip with (pseudo-)labels.

    Closes the real-video domain gap without network access (VERDICT r3
    #5): the synthetic-world checkpoint's score margins collapse on real
    footage, flipping NMS ordering between batch shapes (pipeline/facade
    agreement 68.6% vs 96.5% in-domain, docs/CLIP_PARITY.md). Fine-tuning
    on the clip's own high-confidence detections sharpens those margins.

    Each batch image is either a uniformly sampled clip frame with its
    stored labels (with horizontal-flip + photometric jitter
    augmentation, all on device) or — ``synthetic_frac`` of the batch — a
    freshly rendered synthetic scene, so the adapted checkpoint keeps
    its synthetic-world competence (the quality-gated benchmark rows)
    instead of catastrophically forgetting it.

    The clip arrays are ARGUMENTS of the returned jitted
    ``multi_step(params, opt_state, key, frames, boxes, cls, valid)`` —
    NOT closure captures: a closed-over device array is baked into the
    program as a constant, and a 500-frame clip makes the serialized
    HLO ~780 MB, which the tunneled remote-compile endpoint rejects
    outright (HTTP 413, observed 2026-08-21). Passed as arguments they
    stay device-resident references (zero per-step host traffic, same
    discipline as the synthetic trainer).
    """
    syn_spec = None
    if synthetic_world is not None:
        from .ops.preprocess import letterbox_spec as _lb
        syn_spec = _lb(synthetic_world.hw, input_hw)

    n_syn = (int(round(cfg.batch * synthetic_frac))
             if synthetic_world is not None else 0)
    n_clip = cfg.batch - n_syn

    @jax.jit
    def multi_step(params, opt_state, key, frames_dev, boxes_dev,
                   cls_dev, valid_dev):
        n_frames = frames_dev.shape[0]
        w_src = frames_dev.shape[2]

        def clip_image_loss(params, key):
            ki, kf, kb, kc = jax.random.split(key, 4)
            i = jax.random.randint(ki, (), 0, n_frames)
            frame = frames_dev[i].astype(jnp.float32)
            b = boxes_dev[i]
            gt_cls = cls_dev[i]
            gt_valid = valid_dev[i]
            # horizontal flip (labels mirrored)
            flip = jax.random.bernoulli(kf)
            fb = jnp.stack([w_src - b[:, 2], b[:, 1],
                            w_src - b[:, 0], b[:, 3]], axis=-1)
            frame = jnp.where(flip, frame[:, ::-1], frame)
            b = jnp.where(flip, fb, b)
            # photometric jitter: gain/bias well inside what letterbox
            # /255 normalization sees at inference
            gain = 1.0 + 0.15 * jax.random.uniform(kb, minval=-1.0,
                                                   maxval=1.0)
            bias = 12.0 * jax.random.uniform(kc, minval=-1.0, maxval=1.0)
            frame = jnp.clip(frame * gain + bias, 0.0, 255.0)
            x = preprocess_yolo(frame.astype(jnp.uint8), spec,
                                out_dtype=model.dtype)[0]
            levels = model.apply(params, x[None])
            cls_t, box_t, pos = build_targets(b, gt_cls, gt_valid, spec,
                                              input_hw)
            return detection_loss(levels, cls_t, box_t, pos, cfg)

        def syn_image_loss(params, key):
            ko, kr = jax.random.split(key)
            obj = random_objects(ko, synthetic_world)
            frame = render(obj, synthetic_world, kr)
            gt_xyxy, gt_cls, gt_valid = ground_truth(obj, synthetic_world)
            x = preprocess_yolo(frame, syn_spec, out_dtype=model.dtype)[0]
            levels = model.apply(params, x[None])
            cls_t, box_t, pos = build_targets(
                gt_xyxy, gt_cls, gt_valid, syn_spec, input_hw)
            return detection_loss(levels, cls_t, box_t, pos, cfg)

        def batch_loss(params, key):
            kc, ks = jax.random.split(key)
            loss_c, aux_c = jax.vmap(
                lambda k: clip_image_loss(params, k))(
                    jax.random.split(kc, n_clip))
            parts = [jnp.sum(loss_c)]
            auxes = [jax.tree.map(jnp.sum, aux_c)]
            if n_syn:
                loss_s, aux_s = jax.vmap(
                    lambda k: syn_image_loss(params, k))(
                        jax.random.split(ks, n_syn))
                parts.append(jnp.sum(loss_s))
                auxes.append(jax.tree.map(jnp.sum, aux_s))
            total = sum(parts) / cfg.batch
            aux = jax.tree.map(lambda *xs: sum(xs) / cfg.batch, *auxes)
            return total, aux

        grad_fn = jax.value_and_grad(batch_loss, has_aux=True)

        def one_step(carry, key):
            params, opt_state = carry
            (loss, aux), grads = grad_fn(params, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, aux)

        keys = jax.random.split(key, cfg.scan)
        (params, opt_state), (losses, auxes) = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses, auxes

    return multi_step


def finetune_on_clip(frames: np.ndarray, boxes: np.ndarray,
                     cls: np.ndarray, valid: np.ndarray,
                     params, variant: str = "n",
                     input_hw: Tuple[int, int] = (640, 640),
                     cfg: TrainConfig = TrainConfig(steps=1500, lr=5e-4),
                     synthetic_world: WorldSpec | None = WorldSpec(),
                     synthetic_frac: float = 0.5, log=print):
    """Fine-tune an existing detector on a labeled clip; returns (model,
    params_f32). ``frames`` (F, H, W, 3) u8; ``boxes`` (F, M, 4) xyxy
    source pixels; ``cls`` (F, M) COCO ids; ``valid`` (F, M) bool."""
    from .ops.preprocess import letterbox_spec
    from .runtime.params import compute_dtype

    from .models import YOLOv8
    model = YOLOv8(variant=variant, num_classes=80,
                   dtype=compute_dtype())
    spec = letterbox_spec(frames.shape[1:3], input_hw)

    frames_dev = jnp.asarray(frames)
    boxes_dev = jnp.asarray(boxes, jnp.float32)
    cls_dev = jnp.asarray(cls, jnp.int32)
    valid_dev = jnp.asarray(valid, bool)

    n_disp = max(1, -(-cfg.steps // cfg.scan))
    total_steps = n_disp * cfg.scan
    if total_steps != cfg.steps:
        log(f"steps rounded {cfg.steps} -> {total_steps} "
            f"(scan={cfg.scan} per dispatch)")
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, cfg.warmup, max(total_steps, cfg.warmup + 1),
        cfg.lr / 20)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(sched, weight_decay=cfg.weight_decay))
    opt_state = tx.init(params)
    step_fn = make_clip_train_step(
        model, spec, input_hw, cfg, tx, synthetic_world=synthetic_world,
        synthetic_frac=synthetic_frac)

    key = jax.random.PRNGKey(cfg.seed)
    for i in range(n_disp):
        key, sub = jax.random.split(key)
        params, opt_state, losses, auxes = step_fn(
            params, opt_state, sub, frames_dev, boxes_dev, cls_dev,
            valid_dev)
        if i % max(1, n_disp // 15) == 0 or i == n_disp - 1:
            ls = np.asarray(losses)
            ax = {k: float(np.asarray(v)[-1]) for k, v in auxes.items()}
            log(f"clip step {(i + 1) * cfg.scan:>5}/{total_steps}"
                f"  loss {ls[-1]:.3f} (mean {ls.mean():.3f})"
                f"  cls {ax['cls']:.3f} iou {ax['iou']:.3f}"
                f" dfl {ax['dfl']:.3f}")
    return model, params


def train_reid(world: WorldSpec = WorldSpec(),
               cfg: ReIDTrainConfig = ReIDTrainConfig(), params=None,
               log=print):
    """Train the ReID embedder on synthetic identities; returns (model,
    params)."""
    from .models import ReIDNet
    from .runtime.params import compute_dtype, template_params
    from . import config as pkg_config
    model = ReIDNet(feature_dim=pkg_config.REID_FEATURE_DIM,
                    dtype=compute_dtype())
    if params is None:
        params = template_params(
            model, jnp.zeros((1, *pkg_config.REID_INPUT_SHAPE, 3),
                             jnp.float32))
    # Each dispatch runs exactly cfg.scan fused steps, so the trained step
    # count is cfg.steps rounded UP to a scan multiple; the LR schedule
    # horizon must match the actual count or the tail trains at end_value.
    n_disp = max(1, -(-cfg.steps // cfg.scan))
    total_steps = n_disp * cfg.scan
    if total_steps != cfg.steps:
        log(f"reid steps rounded {cfg.steps} -> {total_steps} "
            f"(scan={cfg.scan} per dispatch)")
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, cfg.warmup, max(total_steps, cfg.warmup + 1),
        cfg.lr / 20)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(sched, weight_decay=cfg.weight_decay))
    opt_state = tx.init(params)
    step_fn = make_reid_train_step(model, world, cfg, tx)

    key = jax.random.PRNGKey(cfg.seed)
    for i in range(n_disp):
        key, sub = jax.random.split(key)
        params, opt_state, losses = step_fn(params, opt_state, sub)
        if i % max(1, n_disp // 15) == 0 or i == n_disp - 1:
            ls = np.asarray(losses)
            log(f"reid step {(i + 1) * cfg.scan:>5}"
                f"/{total_steps}  loss {ls[-1]:.4f} (mean {ls.mean():.4f})")
    return model, params


def train_detector(variant: str = "n", world: WorldSpec = WorldSpec(),
                   input_hw: Tuple[int, int] = (640, 640),
                   cfg: TrainConfig = TrainConfig(), params=None,
                   log=print):
    """Train YOLOv8-`variant` on the synthetic world; returns (model,
    params_f32). Runs on whatever backend jax resolves (TPU for real
    training; tests use tiny shapes on CPU)."""
    from .ops.preprocess import letterbox_spec
    from .runtime.params import compute_dtype, template_params

    model_cd = compute_dtype()
    from .models import YOLOv8
    model = YOLOv8(variant=variant, num_classes=80, dtype=model_cd)
    if params is None:
        params = template_params(
            model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    spec = letterbox_spec(world.hw, input_hw)

    # See train_reid: actual trained steps = scan-multiple ceiling, and the
    # schedule horizon must match it.
    n_disp = max(1, -(-cfg.steps // cfg.scan))
    total_steps = n_disp * cfg.scan
    if total_steps != cfg.steps:
        log(f"steps rounded {cfg.steps} -> {total_steps} "
            f"(scan={cfg.scan} per dispatch)")
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, cfg.warmup, max(total_steps, cfg.warmup + 1),
        cfg.lr / 20)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(sched, weight_decay=cfg.weight_decay))
    opt_state = tx.init(params)
    step_fn = make_train_step(model, world, spec, input_hw, cfg, tx)

    key = jax.random.PRNGKey(cfg.seed)
    for i in range(n_disp):
        key, sub = jax.random.split(key)
        params, opt_state, losses, auxes = step_fn(params, opt_state, sub)
        if i % max(1, n_disp // 20) == 0 or i == n_disp - 1:
            ls = np.asarray(losses)
            ax = {k: float(np.asarray(v)[-1]) for k, v in auxes.items()}
            log(f"step {(i + 1) * cfg.scan:>5}/{total_steps}"
                f"  loss {ls[-1]:.3f} (mean {ls.mean():.3f})"
                f"  cls {ax['cls']:.3f} iou {ax['iou']:.3f}"
                f" dfl {ax['dfl']:.3f}")
    return model, params
