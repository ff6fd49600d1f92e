"""On-device Mixup/CutMix + label smoothing.

Replaces timm's ``Mixup`` used at ``vit/main.py:259-265`` — but runs inside
the jitted train step on TPU (elementwise VPU work fused into the forward)
instead of on the host dataloader.  All three timm pairing modes are
supported (``--mixup-mode``): ``batch`` (one lambda for the whole batch),
``pair`` (one lambda per (i, B-1-i) pair, applied symmetrically), and
``elem`` (an independent lambda and mixup/cutmix choice per sample);
``cutmix_minmax`` switches the cutmix box sampler to timm's
``rand_bbox_minmax`` (box side drawn uniformly from the given fraction
range, lambda derived from the realized area).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

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
    mode: str = "batch"  # batch | pair | elem (timm --mixup-mode)
    cutmix_minmax: Optional[Tuple[float, float]] = None


def one_hot_smooth(labels: Array, num_classes: int, smoothing: float) -> Array:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(key: Array, h: int, w: int, lam: Array,
               minmax: Optional[Tuple[float, float]]) -> Tuple[Array, ...]:
    """One cutmix box.  Default: side ratio sqrt(1-lam) (timm
    ``rand_bbox``); with ``minmax``: each side drawn uniformly from
    [minmax[0], minmax[1]] of the image side (timm ``rand_bbox_minmax``)."""
    ky, kx, kh, kw = jax.random.split(key, 4)
    if minmax is None:
        ratio = jnp.sqrt(1.0 - lam)
        cut_h = (h * ratio).astype(jnp.int32)
        cut_w = (w * ratio).astype(jnp.int32)
    else:
        lo, hi = minmax
        cut_h = jax.random.randint(kh, (), int(h * lo), max(int(h * hi), 1))
        cut_w = jax.random.randint(kw, (), int(w * lo), max(int(w * hi), 1))
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def _symmetrize(x: Array) -> Array:
    """Pair mode: position i and B-1-i share the first half's draw."""
    idx = jnp.arange(x.shape[0])
    cond = (idx < x.shape[0] - 1 - idx).reshape(
        (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(cond, x, x[::-1])


def apply_mixup(
    key: Array,
    images: Array,  # [B, H, W, C]
    labels: Array,  # [B] int
    cfg: MixupConfig,
) -> Tuple[Array, Array]:
    """Mixup/cutmix against the flipped batch (pairing i <-> B-1-i, as
    timm does), returning (mixed images, soft targets)."""
    B, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_lam, k_switch, k_apply, k_box, k_lam2 = jax.random.split(key, 5)
    targets = one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    flipped = images[::-1]
    targets_flipped = targets[::-1]

    per_el = cfg.mode in ("elem", "pair")
    shape = (B,) if per_el else ()
    use_cutmix = jax.random.bernoulli(k_switch, cfg.switch_prob, shape)
    lam_mix = jax.random.beta(k_lam, cfg.mixup_alpha, cfg.mixup_alpha, shape)
    lam_cut = jax.random.beta(k_lam2, cfg.cutmix_alpha, cfg.cutmix_alpha,
                              shape)
    apply = jax.random.bernoulli(k_apply, cfg.prob, shape)
    box_keys = jax.random.split(k_box, B) if per_el else k_box
    if cfg.mode == "pair":
        use_cutmix = _symmetrize(use_cutmix)
        lam_mix = _symmetrize(lam_mix)
        lam_cut = _symmetrize(lam_cut)
        apply = _symmetrize(apply)
        box_keys = _symmetrize(box_keys)

    if per_el:
        el = lambda v: v[:, None, None, None]  # noqa: E731
        y1, y2, x1, x2 = jax.vmap(
            lambda k, lam: _rand_bbox(k, h, w, lam, cfg.cutmix_minmax)
        )(box_keys, lam_cut)
        bput = lambda v: v[:, None, None]  # noqa: E731
    else:
        el = bput = lambda v: v  # noqa: E731
        y1, y2, x1, x2 = _rand_bbox(box_keys, h, w, lam_cut,
                                    cfg.cutmix_minmax)

    mixed_mix = images * el(lam_mix) + flipped * (1 - el(lam_mix))

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    box = ((yy >= bput(y1)) & (yy < bput(y2))
           & (xx >= bput(x1)) & (xx < bput(x2)))[..., None]
    if not per_el:
        box = box[None]
    mixed_cut = jnp.where(box, flipped, images)
    lam_cut_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)

    mixed = jnp.where(el(use_cutmix), mixed_cut, mixed_mix)
    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)
    soft = targets * lam[..., None] + targets_flipped * (1 - lam[..., None])

    images_out = jnp.where(el(apply), mixed, images)
    targets_out = jnp.where(apply[..., None], soft, targets)
    return images_out, targets_out


def soft_target_cross_entropy(logits: Array, soft_targets: Array) -> Array:
    """timm ``SoftTargetCrossEntropy`` (``vit/engine.py`` criterion)."""
    return jnp.mean(
        jnp.sum(-soft_targets * jax.nn.log_softmax(logits, axis=-1), axis=-1))
