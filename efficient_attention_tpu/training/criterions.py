"""Criterions: label-smoothed cross-entropy and adaptive loss.

Replaces ``fairseq/criterions/label_smoothed_cross_entropy.py`` (MT recipe)
and ``fairseq/criterions/adaptive_loss.py`` (LM recipe).  All losses are
token-sum with pad masking, matching fairseq's sample-size accounting
(loss / ntokens, ppl = exp(nll / ntokens / log 2 ... reported in base e here).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def label_smoothed_nll_loss(
    logits: Array,  # [B, T, V]
    targets: Array,  # [B, T]
    epsilon: float = 0.1,
    pad_idx: Optional[int] = 1,
) -> Tuple[Array, Array, Array]:
    """Returns (smoothed loss sum, nll sum, ntokens)
    (``label_smoothed_cross_entropy.py:label_smoothed_nll_loss``)."""
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(lprobs, axis=-1)
    if pad_idx is not None:
        mask = (targets != pad_idx).astype(jnp.float32)
    else:
        mask = jnp.ones_like(nll)
    eps_i = epsilon / (logits.shape[-1] - 1)
    loss = (1.0 - epsilon - eps_i) * nll + eps_i * smooth * logits.shape[-1]
    # fairseq formulation: (1-eps)*nll + eps/(V-1) * sum_{k != y} -lp_k
    # == (1-eps-eps_i)*nll + eps_i * sum_k -lp_k
    return (jnp.sum(loss * mask), jnp.sum(nll * mask), jnp.sum(mask))


def adaptive_loss(
    nll_per_token: Array,  # [B, T] from AdaptiveSoftmax.nll
    targets: Array,
    pad_idx: Optional[int] = 1,
) -> Tuple[Array, Array]:
    """(nll sum, ntokens) over non-pad targets
    (``criterions/adaptive_loss.py``)."""
    if pad_idx is not None:
        mask = (targets != pad_idx).astype(jnp.float32)
    else:
        mask = jnp.ones_like(nll_per_token)
    return jnp.sum(nll_per_token * mask), jnp.sum(mask)


def cross_entropy_loss(logits, targets, pad_idx: Optional[int] = 1):
    """(nll sum, ntokens) (``criterions/cross_entropy.py``)."""
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    mask = (jnp.ones_like(nll) if pad_idx is None
            else (targets != pad_idx).astype(jnp.float32))
    return jnp.sum(nll * mask), jnp.sum(mask)
