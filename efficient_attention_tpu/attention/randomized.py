"""Randomized attention (RA) — the non-linear-cost ancestor of LARA.

TPU-native rebuild of ``efficient-attention/efficient_attention/
randomized_attention.py`` (ICML 2022, "Linear Complexity Randomized
Self-attention Mechanism").  Samples a query-specific random-feature weight
``w = q + k'`` where ``k'`` is drawn from the softmax attention distribution,
then forms an SNIS estimate of softmax attention.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from efficient_attention_tpu.attention.base import MultiheadAttention

Array = jax.Array


class RandomizedAttention(MultiheadAttention):
    """RA with ``num_samples in {-1, 0, k}`` variants
    (``randomized_attention.py:11-53``)."""

    num_samples: int = 1

    def _apply_attention(
        self,
        q: Array,
        k: Array,
        v: Array,
        key_padding_mask: Optional[Array],
        deterministic: bool,
    ) -> Array:
        b, h, n, d = q.shape
        if self.num_samples == 0:
            mu = q + jnp.mean(k, axis=-2, keepdims=True)
        else:
            pi = jax.nn.softmax(
                jnp.einsum("...nd,...md->...nm", self.scale * q, k), axis=-1
            )
            if self.num_samples == -1:
                mu = q + jnp.einsum("...nm,...md->...nd", pi, k)
            else:
                # one categorical draw per query (``randomized_attention.py:36-38``);
                # the reference samples at eval time too, so we always need a key.
                if self.has_rng("sample"):
                    key = self.make_rng("sample")
                else:  # deterministic fallback for rng-less eval calls
                    key = jax.random.PRNGKey(0)
                logits = jnp.log(jnp.clip(pi, min=1e-20))
                k_ind = jax.random.categorical(key, logits, axis=-1)  # [b, h, n]
                k_prime = jnp.take_along_axis(k, k_ind[..., None], axis=-2)
                mu = q + jax.lax.stop_gradient(k_prime)
        if not deterministic:
            mu = mu + jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
        # SNIS softmax estimate (``randomized_attention.py:44-51``)
        data_dash = jnp.einsum("...nd,...md->...nm", mu, self.scale * k)
        norm = self.scale * jnp.sum(k**2, axis=-1)[..., None, :] / 2.0
        if key_padding_mask is not None:
            data_dash = jnp.where(
                key_padding_mask[:, None, None, :].astype(bool),
                -jnp.inf, data_dash - norm,
            )
            snis = jax.nn.softmax(data_dash, axis=-1)
        else:
            snis = jax.nn.softmax(data_dash - norm, axis=-1)
        return jnp.einsum("...nm,...md->...nd", snis, v)

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parent_parser = MultiheadAttention.add_attn_specific_args(
            parent_parser, struct_name=struct_name, prefix=prefix
        )
        parser = parent_parser.add_argument_group("Attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(parser, f"--{p}num-samples", struct_name=struct_name,
                            prefix=prefix, default=1, type=int,
                            help="number of posterior samples")
        return parent_parser
