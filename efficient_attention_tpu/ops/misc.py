"""Misc attention utilities for parity with ``attn_utils.py``."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def look_around(x: Array, backward: int = 1, forward: int = 0,
                pad_value: float = -1.0, axis: int = -2) -> Array:
    """Concatenate shifted copies so each block sees its neighbors
    (``attn_utils.look_around``, ``attn_utils.py:33-42``).

    x: ``[..., t, w, d]`` (axis=-2 concat over w) or ``[..., t, w]``.
    """
    assert axis in (-1, -2)
    block_axis = axis - 1  # the t axis
    t = x.shape[block_axis]
    pads = [(0, 0)] * x.ndim
    pads[block_axis % x.ndim] = (backward, forward)
    padded = jnp.pad(x, pads, constant_values=pad_value)
    pieces = [
        jax.lax.slice_in_dim(padded, ind, ind + t, axis=block_axis)
        for ind in range(forward + backward + 1)
    ]
    return jnp.concatenate(pieces, axis=axis)


def merger(x: Array, config: str = "identity-mean", axis: int = -2,
           keepdims: bool = False,
           dense_fn: Optional[Callable] = None) -> Array:
    """'<act>-<pooler>' pooling (``attn_utils.Merger``, ``attn_utils.py:116``).

    act in {relu, identity, deepset (requires dense_fn)}; pooler in
    {mean, max}.
    """
    act, pool = config.split("-")
    if act == "relu":
        x = jax.nn.relu(x)
    elif act == "deepset":
        assert dense_fn is not None, "deepset merger needs a dense_fn"
        x = jax.nn.relu(dense_fn(x))
    elif act != "identity":
        raise ValueError(f"Unsupported activation: {act}")
    if pool == "mean":
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    if pool == "max":
        return jnp.max(x, axis=axis, keepdims=keepdims)
    raise ValueError(f"Unsupported pooling: {pool}")


def fill_with_neg_inf(shape, dtype=jnp.float32) -> Array:
    """-inf tensor (``attn_utils.fill_with_neg_inf``)."""
    return jnp.full(shape, -jnp.inf, dtype)


def future_mask(n: int) -> np.ndarray:
    """Static upper-triangular causal mask of -inf above the diagonal
    (``attn_utils.buffered_future_mask`` — static shapes make buffering
    unnecessary under jit)."""
    mask = np.zeros((n, n), np.float32)
    mask[np.triu_indices(n, 1)] = -np.inf
    return mask
