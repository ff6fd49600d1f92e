"""Random-feature maps for linearized softmax attention, TPU-native.

Pure-jnp re-derivations of the feature maps in the reference
(``efficient-attention/efficient_attention/kernelized_attention.py:13-114`` and
``attn_utils.py:237-348``).  All maps take explicit projection matrices /
PRNG keys — PyTorch's implicit global RNG becomes threaded `jax.random` keys.

Everything here is batched matmul + elementwise, which XLA fuses onto
MXU/VPU directly; the Pallas kernels reuse these formulas inline.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def prm_projection(
    data: Array,
    projection: Array,
    normalize: bool = True,
    diagonal: bool = False,
    return_exp: bool = False,
    is_query: bool = False,
    eps: float = 1e-8,
) -> Array:
    """Positive-random-matrix softmax-kernel features.

    Port of ``attn_utils.prm_projection`` (``attn_utils.py:292-348``):
    ``log phi(x)[c] = <w_c, x> / sqrt(d) - |x|^2 / (2 sqrt(d))``.

    data: ``[..., n, d]``; projection: ``[..., m, d]`` -> ``[..., m, n]``
    (or ``[..., n]`` when ``diagonal``).
    """
    d = data.shape[-1]
    data_normalizer = d ** -0.5
    if diagonal:
        data_dash = jnp.einsum("...nd,...nd->...n", projection, data_normalizer * data)
        norm = data_normalizer * jnp.sum(data**2, axis=-1) / 2.0
    else:
        data_dash = jnp.einsum("...nd,...md->...nm", projection, data_normalizer * data)
        norm = data_normalizer * jnp.sum(data**2, axis=-1)[..., None, :] / 2.0
    if normalize:
        return jax.nn.softmax(data_dash - norm, axis=-1)
    if return_exp:
        if is_query:
            stab = jax.lax.stop_gradient(jnp.max(data_dash, axis=-2, keepdims=True))
        else:
            stab = jax.lax.stop_gradient(
                jnp.max(data_dash, axis=(-1, -2, -3), keepdims=True)
            )
        return jnp.exp(data_dash - norm - stab) + eps
    return data_dash - norm


def hyperm_projection(
    data: Array,
    projection: Array,
    diagonal: bool = False,
    eps: float = 1e-4,
) -> Array:
    """Hyperbolic (±) variant of prm features (``attn_utils.hyperm_projection``,
    ``attn_utils.py:237-288``)."""
    d = data.shape[-1]
    data_normalizer = d ** -0.5
    if diagonal:
        data_dash = jnp.einsum("...nd,...nd->...n", projection, data_normalizer * data)
        norm = data_normalizer * jnp.sum(data**2, axis=-1) / 2.0
    else:
        data_dash = jnp.einsum("...nd,...md->...nm", projection, data_normalizer * data)
        norm = data_normalizer * jnp.sum(data**2, axis=-1)[..., None, :] / 2.0
    stab_pos = jax.lax.stop_gradient(jnp.max(data_dash, axis=(-1, -2), keepdims=True))
    stab_neg = jax.lax.stop_gradient(jnp.max(-data_dash, axis=(-1, -2), keepdims=True))
    return math.sqrt(0.5) * (
        jnp.concatenate(
            [jnp.exp(data_dash - norm - stab_pos), jnp.exp(-data_dash - norm - stab_neg)],
            axis=-2,
        )
        + eps
    )


def favorp_projection(
    data: Array,
    projection: Array,
    is_query: bool,
    eps: float = 1e-4,
) -> Array:
    """Performer FAVOR+ nonnegative features
    (``kernelized_attention.favorp_projection``, ``kernelized_attention.py:20-56``).

    data: ``[b, h, n, d]``; projection: ``[h, m, d]`` -> ``[b, h, n, m]``.
    """
    data_normalizer = data.shape[-1] ** -0.25
    ratio = projection.shape[-2] ** -0.5
    data_dash = jnp.einsum("bh...d,hjd->bh...j", data_normalizer * data, projection)
    diag = (jnp.sum(data**2, axis=-1) / 2.0) * data_normalizer**2
    diag = diag[..., None]
    if is_query:
        stab = jax.lax.stop_gradient(jnp.max(data_dash, axis=-1, keepdims=True))
    else:
        stab = jax.lax.stop_gradient(jnp.max(data_dash, axis=(-1, -2), keepdims=True))
    return ratio * jnp.exp(data_dash - diag - stab) + eps


def log_favorp_projection(
    data: Array,
    projection: Array,
    is_query: bool,
) -> Array:
    """Log-space FAVOR+ features for ScatterBrain
    (``scatterbrain_attention.log_favorp_projection_for_scatterbrain``,
    ``scatterbrain_attention.py:10-45``)."""
    data_normalizer = data.shape[-1] ** -0.25
    ratio = projection.shape[-2]
    data_dash = jnp.einsum("bh...d,hjd->bh...j", data_normalizer * data, projection)
    diag = (jnp.sum(data**2, axis=-1) / 2.0) * data_normalizer**2
    return data_dash - diag[..., None] - math.log(ratio) / 2


def fourier_projection(
    data: Array,
    projection: Array,
    is_query: Optional[bool] = None,
    eps: float = 1e-4,
) -> Array:
    """Random Fourier features (``kernelized_attention.fourier_projection``,
    ``kernelized_attention.py:58-85``)."""
    del is_query
    data_normalizer = data.shape[-1] ** -0.25
    data_dash = jnp.einsum("bn...d,njd->bn...j", data_normalizer * data, projection)
    ratio = projection.shape[-2] ** -0.5
    phi = ratio * jnp.concatenate([jnp.sin(data_dash), jnp.cos(data_dash)], axis=-1)
    h = (jnp.sum(data**2, axis=-1) / 2.0) * data_normalizer**2
    h = jnp.exp(h - jax.lax.stop_gradient(jnp.max(h, axis=-1, keepdims=True)))[..., None]
    return h * phi


def dpfp_projection(x: Array, is_query: bool = True, nu: int = 1) -> Array:
    """Deterministic parameter-free projection (DPFP)
    (``kernelized_attention.dpfp_projection``, ``kernelized_attention.py:13-18``)."""
    del is_query
    x = jnp.concatenate([jax.nn.relu(x), jax.nn.relu(-x)], axis=-1)
    x_rolled = jnp.concatenate(
        [jnp.roll(x, shift=j, axis=-1) for j in range(1, nu + 1)], axis=-1
    )
    x_repeat = jnp.concatenate([x] * nu, axis=-1)
    return x_repeat * x_rolled


def generalized_projection(
    data: Array,
    projection: Array,
    is_query: bool,
    projection_fn: Callable[[Array], Array],
    eps: float = 1e-3,
) -> Array:
    """Generic ``f(Wx)`` features, e.g. relu (``kernelized_attention.py:90-114``)."""
    del is_query
    ratio = projection.shape[-2] ** -0.5
    data_normalizer = data.shape[-1] ** -0.25
    data_dash = ratio * jnp.einsum("bn...d,njd->bn...j", data_normalizer * data, projection)
    return projection_fn(data_dash) + eps


def nonlinear_map(
    data: Array, mapping_fn: Callable[[Array], Array], is_query: bool = False, eps: float = 1e-1
) -> Array:
    """Projection-free elementwise feature map (``kernelized_attention.py:87``)."""
    del is_query
    return mapping_fn(data) + eps


def linear_attention(q_prime: Array, k_prime: Array, v: Array, eps: float = 1e-2) -> Array:
    """O(n·m·d) linear attention core (``kernelized_attention.linear_attention``,
    ``kernelized_attention.py:116-121``).  Runs in fp32 for stability
    (matching ``kernelized_attention.py:345``)."""
    kv = jnp.einsum("...nm,...nd->...md", k_prime, v)
    qkv = jnp.einsum("...nm,...md->...nd", q_prime, kv)
    normalizer = jnp.einsum("...nm,...m->...n", q_prime, jnp.sum(k_prime, axis=-2))
    return qkv / jnp.clip(normalizer[..., None], min=eps)


def cos_reweighted_linear_attention(
    q_prime: Array, k_prime: Array, v: Array, eps: float = 1e-2
) -> Array:
    """cosFormer re-weighted linear attention
    (``kernelized_attention.cos_reweighted_linear_attention``,
    ``kernelized_attention.py:123-156``)."""
    max_len = v.shape[-2]
    idxs = (math.pi / 2) * jnp.arange(max_len, dtype=v.dtype) / max_len
    cos = jax.lax.stop_gradient(jnp.cos(idxs))[None, None, :, None]
    sin = jax.lax.stop_gradient(jnp.sin(idxs))[None, None, :, None]
    q_cos, q_sin = q_prime * cos, q_prime * sin
    k_cos, k_sin = k_prime * cos, k_prime * sin
    kv_cos = jnp.einsum("...nm,...nd->...md", k_cos, v)
    kv_sin = jnp.einsum("...nm,...nd->...md", k_sin, v)
    qkv = jnp.einsum("...nm,...md->...nd", q_cos, kv_cos) + jnp.einsum(
        "...nm,...md->...nd", q_sin, kv_sin
    )
    normalizer = jnp.einsum("...nm,...m->...n", q_cos, jnp.sum(k_cos, axis=-2)) + jnp.einsum(
        "...nm,...m->...n", q_sin, jnp.sum(k_sin, axis=-2)
    )
    return qkv / jnp.clip(normalizer[..., None], min=eps)


def orthogonal_gaussian_matrix(
    key: jax.Array, nb_rows: int, nb_cols: int, dtype=jnp.float32
) -> Array:
    """Gaussian matrix with orthogonal row blocks, norm-rescaled
    (``kernelized_attention.gaussian_orthogonal_random_matrix``,
    ``kernelized_attention.py:201-221``)."""
    nb_full_blocks = nb_rows // nb_cols
    remaining = nb_rows - nb_full_blocks * nb_cols
    n_blocks = nb_full_blocks + (1 if remaining > 0 else 0)
    keys = jax.random.split(key, n_blocks + 1)
    blocks = []
    for i in range(n_blocks):
        unstructured = jax.random.normal(keys[i], (nb_cols, nb_cols), dtype=jnp.float32)
        q, _ = jnp.linalg.qr(unstructured)
        blocks.append(q.T)
    final = jnp.concatenate(blocks, axis=0)[:nb_rows]
    multiplier = jnp.linalg.norm(
        jax.random.normal(keys[-1], (nb_rows, nb_cols), dtype=jnp.float32), axis=1
    )
    return (multiplier[:, None] * final).astype(dtype)


def create_proj_matrix(
    key: jax.Array,
    num_heads: int,
    proj_dim: int,
    input_dim: int,
    ortho: bool = False,
    dtype=jnp.float32,
) -> Array:
    """Stack of per-head projection matrices ``[h, m, d]``
    (``kernelized_attention.create_proj_matrix``, ``kernelized_attention.py:191-199``)."""
    if ortho:
        keys = jax.random.split(key, num_heads)
        return jnp.stack(
            [orthogonal_gaussian_matrix(k, proj_dim, input_dim, dtype) for k in keys]
        )
    return jax.random.normal(key, (num_heads, proj_dim, input_dim), dtype=dtype)
