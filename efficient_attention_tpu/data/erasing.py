"""Device-side random erasing (timm ``RandomErasing`` semantics).

The DeiT recipe uses ``--reprob 0.25 --remode pixel --recount 1``
(``vit/main.py:119-124``); timm applies it per-image after normalization.
Random erasing is shape-preserving, so on TPU it belongs on device inside
the jitted train step (no host round-trip, fuses with the input pipeline):
the erased rectangle is realized as an iota-mask select rather than a
dynamic-shape slice, which keeps the op fully static for XLA.

Distribution notes vs timm: timm rejection-samples up to 10 times for a
rectangle that fits; here the rectangle is clamped to fit (the acceptance
region differs only for extreme aspect draws on non-square images).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ErasingConfig(NamedTuple):
    prob: float = 0.25
    min_area: float = 0.02
    max_area: float = 1 / 3
    min_aspect: float = 0.3
    max_aspect: float = 3.3
    mode: str = "pixel"  # 'pixel' (per-pixel normal) | 'const' (zeros)
    count: int = 1


def _erase_one(key: Array, img: Array, cfg: ErasingConfig) -> Array:
    """Erase one random rectangle of ``img`` [H, W, C] (always erases; the
    keep/apply coin is flipped by the caller)."""
    h, w, _ = img.shape
    k_area, k_aspect, k_top, k_left, k_noise = jax.random.split(key, 5)
    area = jax.random.uniform(k_area, (), minval=cfg.min_area,
                              maxval=cfg.max_area) * (h * w)
    log_ar = jax.random.uniform(
        k_aspect, (), minval=jnp.log(cfg.min_aspect),
        maxval=jnp.log(cfg.max_aspect))
    aspect = jnp.exp(log_ar)
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w).astype(jnp.int32)
    top = jax.random.randint(k_top, (), 0, jnp.maximum(h - eh, 0) + 1)
    left = jax.random.randint(k_left, (), 0, jnp.maximum(w - ew, 0) + 1)
    rows = jnp.arange(h)[:, None, None]
    cols = jnp.arange(w)[None, :, None]
    mask = ((rows >= top) & (rows < top + eh)
            & (cols >= left) & (cols < left + ew))
    if cfg.mode == "pixel":
        fill = jax.random.normal(k_noise, img.shape, img.dtype)
    else:
        fill = jnp.zeros_like(img)
    return jnp.where(mask, fill, img)


def apply_random_erasing(key: Array, images: Array,
                         cfg: ErasingConfig) -> Array:
    """Per-image random erasing over a batch [B, H, W, C]."""
    if cfg.prob <= 0.0:
        return images

    def per_image(key, img):
        k_coin, k_rect = jax.random.split(key)
        coin = jax.random.uniform(k_coin, ()) < cfg.prob

        def do(img):
            out = img
            for i in range(cfg.count):
                out = _erase_one(jax.random.fold_in(k_rect, i), out, cfg)
            return out

        return jnp.where(coin, do(img), img)

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(per_image)(keys, images)
