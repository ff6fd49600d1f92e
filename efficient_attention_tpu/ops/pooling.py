"""Adaptive average pooling as a static matrix contraction.

``torch.nn.AdaptiveAvgPool2d`` semantics (segment boundaries
``start = floor(i*H/o)``, ``end = ceil((i+1)*H/o)``) expressed as one
precomputed ``[o, H]`` averaging matrix per axis so the pool becomes two
small matmuls — MXU-friendly and exactly equal to torch's output.
Used by LARA's pooled landmark proposals (``lara.py:41-70``).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def adaptive_pool_matrix(in_size: int, out_size: int, dtype=np.float32) -> np.ndarray:
    """``[out_size, in_size]`` row-stochastic averaging matrix."""
    mat = np.zeros((out_size, in_size), dtype=dtype)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = math.ceil((i + 1) * in_size / out_size)
        mat[i, start:end] = 1.0 / (end - start)
    return mat


def adaptive_avg_pool_2d(x: Array, out_hw: int) -> Array:
    """Adaptive 2-D average pool over the last two spatial axes.

    x: ``[..., H, W]`` -> ``[..., o, o]``.
    """
    H, W = x.shape[-2], x.shape[-1]
    mh = jnp.asarray(adaptive_pool_matrix(H, out_hw), dtype=x.dtype)
    mw = jnp.asarray(adaptive_pool_matrix(W, out_hw), dtype=x.dtype)
    x = jnp.einsum("oh,...hw->...ow", mh, x)
    return jnp.einsum("pw,...ow->...op", mw, x)


def segment_mean_landmarks(x: Array, landmarks: int) -> Array:
    """1-D segment-mean landmark construction incl. non-divisible lengths.

    Port of the reference's split construction (``lara.py:104-127``): with
    ``segs = n // landmarks`` and ``num_k = (segs+1)*landmarks - n``, the first
    ``num_k`` landmarks average ``segs`` items and the rest ``segs+1``.

    x: ``[b, h, n, d]`` -> ``[b, h, landmarks, d]`` (identity if n <= landmarks).
    """
    b, h, n, d = x.shape
    if n <= landmarks:
        return x
    if n % landmarks == 0:
        return jnp.mean(x.reshape(b, h, landmarks, n // landmarks, d), axis=-2)
    segs = n // landmarks
    num_k = (segs + 1) * landmarks - n
    first = jnp.mean(
        x[:, :, : num_k * segs].reshape(b, h, num_k, segs, d), axis=-2
    )
    last = jnp.mean(
        x[:, :, num_k * segs:].reshape(b, h, landmarks - num_k, segs + 1, d), axis=-2
    )
    return jnp.concatenate([first, last], axis=-2)
