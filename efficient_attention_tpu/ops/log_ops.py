"""Numerically-stable log-space primitives.

Ports of ``attn_utils.{log_add_exp,log_matmul_exp,log_avg_exp}``
(``efficient-attention/efficient_attention/attn_utils.py:44-113``), used by
ScatterBrain's sparse+low-rank fusion.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def log_add_exp(
    a: Array, b: Array, mask: Optional[Tuple[float, float]] = None, eps: float = 1e-5
) -> Array:
    """``log(m0*exp(a) + m1*exp(b))``; ``mask=(1,-1)`` gives stable log-subtract
    (``attn_utils.py:44-51``)."""
    if mask is None:
        mask = (1.0, 1.0)
    m = jnp.maximum(a, b)
    return m + jnp.log(jnp.exp(a - m) * mask[0] + jnp.exp(b - m) * mask[1] + eps)


def log_matmul_exp(v1: Array, v2: Array, eps: float = 1e-6) -> Array:
    """Stable ``log(exp(v1) @ exp(v2))`` (``attn_utils.py:53-66``)."""
    m1 = jax.lax.stop_gradient(jnp.max(v1, axis=-1, keepdims=True))
    m2 = jax.lax.stop_gradient(jnp.max(v2, axis=-2, keepdims=True))
    return m1 + m2 + jnp.log(jnp.matmul(jnp.exp(v1 - m1), jnp.exp(v2 - m2)) + eps)


def log_avg_exp(
    t: Array,
    mask: Optional[Array] = None,
    axis: int = -1,
    eps: float = 1e-6,
    keepdims: bool = False,
) -> Array:
    """Stable ``log(mean(exp(t)))`` (``attn_utils.py:68-113``).

    NOTE: the reference divides by ``n`` *and* subtracts ``log n`` again
    (``attn_utils.py:104-110``), i.e. computes ``logsumexp - 2 log n``.  The
    function is unused by the attention zoo, so we keep the mathematically
    correct single normalization here.
    """
    if mask is not None:
        mask_value = -jnp.finfo(t.dtype).max
        t = jnp.where(mask, t, mask_value)
        n = jnp.sum(mask, axis=axis)
    else:
        n = t.shape[axis]
    max_t = jax.lax.stop_gradient(jnp.max(t, axis=axis))
    t_exp = jnp.exp(t - jnp.expand_dims(max_t, axis))
    avg_exp = jnp.clip(jnp.sum(t_exp, axis=axis), min=eps) / n
    out = jnp.log(avg_exp + eps) + max_t
    return jnp.expand_dims(out, axis) if keepdims else out
