"""On-device Mixup/CutMix + label smoothing.

Replaces timm's ``Mixup`` used at ``vit/main.py:259-265`` — but runs inside
the jitted train step on TPU (elementwise VPU work fused into the forward)
instead of on the host dataloader.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class MixupConfig(NamedTuple):
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 1000


def one_hot_smooth(labels: Array, num_classes: int, smoothing: float) -> Array:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(key: Array, h: int, w: int, lam: Array) -> Tuple[Array, ...]:
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def apply_mixup(
    key: Array,
    images: Array,  # [B, H, W, C]
    labels: Array,  # [B] int
    cfg: MixupConfig,
) -> Tuple[Array, Array]:
    """Batch-level mixup/cutmix (one lambda per batch, flipped pairing),
    returning (mixed images, soft targets)."""
    k_lam, k_switch, k_apply, k_box, k_lam2 = jax.random.split(key, 5)
    targets = one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    flipped = images[::-1]
    targets_flipped = targets[::-1]

    use_cutmix = jax.random.bernoulli(k_switch, cfg.switch_prob)
    lam_mix = jax.random.beta(k_lam, cfg.mixup_alpha, cfg.mixup_alpha)
    lam_cut = jax.random.beta(k_lam2, cfg.cutmix_alpha, cfg.cutmix_alpha)

    # mixup branch
    mixed_mix = images * lam_mix + flipped * (1 - lam_mix)

    # cutmix branch: paste a box from the flipped batch
    h, w = images.shape[1], images.shape[2]
    y1, y2, x1, x2 = _rand_bbox(k_box, h, w, lam_cut)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    box = ((yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2))[None, :, :, None]
    mixed_cut = jnp.where(box, flipped, images)
    lam_cut_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)

    mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)
    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)
    soft = targets * lam + targets_flipped * (1 - lam)

    apply = jax.random.bernoulli(k_apply, cfg.prob)
    images_out = jnp.where(apply, mixed, images)
    targets_out = jnp.where(apply, soft, targets)
    return images_out, targets_out


def soft_target_cross_entropy(logits: Array, soft_targets: Array) -> Array:
    """timm ``SoftTargetCrossEntropy`` (``vit/engine.py`` criterion)."""
    return jnp.mean(
        jnp.sum(-soft_targets * jax.nn.log_softmax(logits, axis=-1), axis=-1))
