"""Blocked window partitioning for local attention, TPU-native.

The reference (``efficient-attention/efficient_attention/attn_utils.py:155-234``)
expresses overlapping-halo windows with ``torch.as_strided`` over a padded
tensor, which is free on CUDA but has no XLA equivalent.  Here halos are
expressed as a single static gather over the padded sequence axis — XLA lowers
a constant-index gather to an efficient copy, and the Pallas kernels bypass
this entirely by indexing halos inside the kernel.

Shapes follow the reference conventions:
  * 1-D: ``[..., n, d] -> [..., g, w + 2e, d]``
  * 2-D (Swin-style, ``attn_utils.py:190-234``):
    ``[..., H, W, d] -> [..., gh*gw, (w + 2e)**2, d]``
  * causal 1-D (``causal_eva.py:102-113``): backward-only halo,
    ``[..., n, d] -> [..., g, e + w, d]``.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pad_to_multiple(
    x: Array,
    multiple: int,
    axis: int = -2,
    value: float = 0.0,
) -> Array:
    """Right-pad ``axis`` so its length is a multiple of ``multiple``.

    Mirrors ``attn_utils.pad_to_multiple`` (``attn_utils.py:12-30``) minus the
    mask-creation flag; use :func:`padding_mask_for` to build the mask (static
    shapes make the two-return variant unnecessary under jit).
    """
    n = x.shape[axis]
    remainder = (-n) % multiple
    if remainder == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis % x.ndim] = (0, remainder)
    return jnp.pad(x, pad, constant_values=value)


def padding_mask_for(batch: int, orig_len: int, padded_len: int) -> Array:
    """Boolean key-padding mask (True = padding) for a right-padded sequence."""
    return jnp.broadcast_to(jnp.arange(padded_len) >= orig_len, (batch, padded_len))


def window_1d_partition(
    x: Array,
    window_size: int,
    ext_window_size: int = 0,
    pad_val: float = 0.0,
) -> Array:
    """Partition ``[..., n, d]`` into ``[..., g, w + 2e, d]`` windows.

    With ``ext_window_size > 0`` each window is extended by a symmetric halo of
    ``e`` positions on both sides (reference ``attn_utils.window_1d_partition``,
    ``attn_utils.py:155-166``).
    """
    *lead, n, d = x.shape
    assert n % window_size == 0, f"n={n} not divisible by window {window_size}"
    g = n // window_size
    if ext_window_size <= 0:
        return x.reshape(*lead, g, window_size, d)
    e = ext_window_size
    pad = [(0, 0)] * (x.ndim - 2) + [(e, e), (0, 0)]
    xp = jnp.pad(x, pad, constant_values=pad_val)
    total = window_size + 2 * e
    idx = (np.arange(g)[:, None] * window_size + np.arange(total)[None, :]).reshape(-1)
    out = jnp.take(xp, jnp.asarray(idx), axis=-2)
    return out.reshape(*lead, g, total, d)


def causal_window_1d_partition(
    x: Array,
    window_size: int,
    ext_window_size: int = 0,
    pad_val: float = 0.0,
) -> Array:
    """Backward-halo-only variant used by causal EVA (``causal_eva.py:102-113``).

    Returns ``[..., g, e + w, d]`` where the halo covers only *earlier*
    positions.
    """
    *lead, n, d = x.shape
    assert n % window_size == 0
    g = n // window_size
    if ext_window_size <= 0:
        return x.reshape(*lead, g, window_size, d)
    e = ext_window_size
    pad = [(0, 0)] * (x.ndim - 2) + [(e, 0), (0, 0)]
    xp = jnp.pad(x, pad, constant_values=pad_val)
    total = window_size + e
    idx = (np.arange(g)[:, None] * window_size + np.arange(total)[None, :]).reshape(-1)
    out = jnp.take(xp, jnp.asarray(idx), axis=-2)
    return out.reshape(*lead, g, total, d)


def window_1d_merge(x: Array) -> Array:
    """Inverse of non-overlapping 1-D partition: ``[..., g, w, d] -> [..., g*w, d]``."""
    *lead, g, w, d = x.shape
    return x.reshape(*lead, g * w, d)


def window_2d_partition(
    x: Array,
    window_size: int,
    ext_window_size: int = 0,
    pad_val: float = 0.0,
) -> Array:
    """Swin-style 2-D windows with optional halo.

    ``[..., H, W, d] -> [..., gh*gw, (w + 2e)**2, d]``
    (reference ``attn_utils.window_2d_partition``, ``attn_utils.py:190-210``).
    """
    *lead, H, W, d = x.shape
    w = window_size
    assert H % w == 0 and W % w == 0, f"H={H}, W={W} not divisible by window {w}"
    gh, gw = H // w, W // w
    if ext_window_size <= 0:
        out = x.reshape(*lead, gh, w, gw, w, d)
        out = jnp.moveaxis(out, -3, -4)  # [..., gh, gw, w, w, d]
        return out.reshape(*lead, gh * gw, w * w, d)
    e = ext_window_size
    total = w + 2 * e
    pad = [(0, 0)] * (x.ndim - 3) + [(e, e), (e, e), (0, 0)]
    xp = jnp.pad(x, pad, constant_values=pad_val)
    row_idx = (np.arange(gh)[:, None] * w + np.arange(total)[None, :]).reshape(-1)
    col_idx = (np.arange(gw)[:, None] * w + np.arange(total)[None, :]).reshape(-1)
    out = jnp.take(xp, jnp.asarray(row_idx), axis=-3)  # [..., gh*total, W+2e, d]
    out = out.reshape(*lead, gh, total, W + 2 * e, d)
    out = jnp.take(out, jnp.asarray(col_idx), axis=-2)  # [..., gh, total, gw*total, d]
    out = out.reshape(*lead, gh, total, gw, total, d)
    out = jnp.moveaxis(out, -3, -4)  # [..., gh, gw, total, total, d]
    return out.reshape(*lead, gh * gw, total * total, d)


def window_2d_merge(x: Array, window_size: int, hw: Tuple[int, int]) -> Array:
    """Inverse of non-overlapping 2-D partition.

    ``[..., gh*gw, w*w, d] -> [..., H, W, d]``
    (reference ``attn_utils.window_2d_merge``, ``attn_utils.py:212-234``).
    """
    H, W = hw
    w = window_size
    gh, gw = H // w, W // w
    *lead, n_win, win_sq, d = x.shape
    assert n_win == gh * gw and win_sq == w * w
    out = x.reshape(*lead, gh, gw, w, w, d)
    out = jnp.moveaxis(out, -3, -4)  # [..., gh, w, gw, w, d]
    return out.reshape(*lead, H, W, d)
