"""Sequence/context parallelism for EVA-style window+chunk attention.

The reference has NO sequence parallelism (SURVEY §2.3 item 7) — its
long-context strategy is algorithmic.  That structure shards perfectly:
blocked local attention is embarrassingly parallel along the window axis,
and the global branch needs only an all-gather of the tiny ``[c, d]`` chunk
summaries (``rf_k_bar``/``beta``) across the ``seq`` mesh axis — the
idiomatic TPU replacement for ring attention, riding ICI with O(c*d) bytes
instead of O(n*d).

Use inside ``shard_map`` over a mesh with a ``seq`` axis; windows and chunks
must not straddle shard boundaries (``N_shard % window == 0``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from efficient_attention_tpu.attention.base import MASK_VAL

Array = jax.Array


def gather_chunk_summaries(rf_k_bar: Array, beta: Array, axis_name: str
                           ) -> Tuple[Array, Array]:
    """All-gather per-shard chunk summaries along the chunk axis.

    rf_k_bar/beta: ``[b, h, c_local, d]`` -> ``[b, h, c_total, d]``.
    """
    rf = jax.lax.all_gather(rf_k_bar, axis_name, axis=2, tiled=True)
    bt = jax.lax.all_gather(beta, axis_name, axis=2, tiled=True)
    return rf, bt


def eva_joint_attention_shard(
    w_q: Array,  # [b, h, g_local, s, d] this shard's windows
    w_k: Array,
    w_v: Array,
    rf_k_bar_local: Array,  # [b, h, c_local, d] this shard's chunk summaries
    beta_local: Array,
    scale: float,
    axis_name: str,
    bias: Optional[Array] = None,  # [h, s, s]
) -> Array:
    """Sequence-parallel EVA attention: local windows stay on-shard, chunk
    summaries are all-gathered (the only collective).  Matches the global
    joint-softmax computation (``eva.py:200-227``) exactly."""
    rf_k_bar, beta = gather_chunk_summaries(
        rf_k_bar_local, beta_local, axis_name)
    local = jnp.einsum("bhgid,bhgjd->bhgij", w_q, w_k,
                       preferred_element_type=jnp.float32) * scale
    if bias is not None:
        local = local + bias[None, :, None].astype(local.dtype)
    chunk = jnp.einsum("bhgid,bhcd->bhgic", w_q, scale * rf_k_bar)
    s = local.shape[-1]
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk.astype(local.dtype)], axis=-1), axis=-1
    ).astype(w_v.dtype)
    return (jnp.einsum("bhgij,bhgjd->bhgid", attn[..., :s], w_v)
            + jnp.einsum("bhgic,bhcd->bhgid", attn[..., s:], beta))


def causal_eva_attention_shard(
    w_q: Array,  # [b, h, g_local, w, d] this shard's causal windows
    w_k: Array,
    w_v: Array,
    rf_k_bar_local: Array,  # [b, h, c_local, d] this shard's chunk summaries
    beta_local: Array,
    scale: float,
    axis_name: str,
    chunk_size: int,
    bias: Optional[Array] = None,  # [w, w] head-shared T5 bias
) -> Array:
    """Sequence-parallel CAUSAL EVA (the LM family's context parallelism).

    The decoder analogue of :func:`eva_joint_attention_shard`
    (``causal_eva.py:666-788`` semantics): causal windows are shard-local
    (no halo — ``overlap_window=False``), chunk summaries are all-gathered
    (the only collective, O(c*d) bytes over ICI), and chunk causality uses
    GLOBAL positions: a query at global position p sees gathered chunk c
    iff ``c < p // chunk_size``.  Shards must hold whole windows
    (``n_local % window == 0``) and windows whole chunks.
    """
    rf_k_bar, beta = gather_chunk_summaries(
        rf_k_bar_local, beta_local, axis_name)
    shard = jax.lax.axis_index(axis_name)
    _, _, g_local, w, _ = w_q.shape
    c_total = rf_k_bar.shape[2]

    local = jnp.einsum("bhgid,bhgjd->bhgij", w_q, w_k,
                       preferred_element_type=jnp.float32) * scale
    if bias is not None:
        local = local + bias[None, None, None].astype(local.dtype)
    tri = jnp.triu(jnp.ones((w, w), bool), 1)
    local = jnp.where(tri[None, None, None], MASK_VAL, local)

    chunk = jnp.einsum("bhgid,bhcd->bhgic", w_q, scale * rf_k_bar)
    # global position of query (g, i) on this shard
    pos = ((shard * g_local + jnp.arange(g_local))[:, None] * w
           + jnp.arange(w)[None, :])                     # [g_local, w]
    blocked = (jnp.arange(c_total)[None, None, :]
               >= (pos // chunk_size)[..., None])        # [g, i, c]
    chunk = jnp.where(blocked[None, None], MASK_VAL, chunk)

    s = local.shape[-1]
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk.astype(local.dtype)], axis=-1), axis=-1
    ).astype(w_v.dtype)
    return (jnp.einsum("bhgij,bhgjd->bhgid", attn[..., :s], w_v)
            + jnp.einsum("bhgic,bhcd->bhgid", attn[..., s:], beta))
