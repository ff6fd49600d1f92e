"""Transformer encoder-decoder (MT) and decoder-only LM, batch-first.

Compact TPU-native replacement for the reference's fairseq fork model stack
(``fairseq/models/transformer/*``, ``fairseq/models/transformer_lm.py``) with
the fork's signature feature: factory-built efficient attention in the
encoder (``fairseq/modules/efficient_attention.py``,
``transformer_layer.py:86-95``) and ``causal_eva`` | ``softmax`` decoder
self-attention (``transformer_layer.py:295-321``).  Cross-attention stays
exact softmax (``transformer_layer.py:323-331``).

Decoding uses fixed-shape pytree caches (KV cache for softmax, EvaDecodeState
for causal EVA) carried through ``lax.scan`` / beam search.
"""
from __future__ import annotations

import math
from dataclasses import field
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efficient_attention_tpu import AttentionFactory
from efficient_attention_tpu.attention import CausalEVAttention, EvaDecodeState
from efficient_attention_tpu.attention.base import MASK_VAL

Array = jax.Array


# LayerNorm epsilon follows torch.nn.LayerNorm's default (1e-5), which is
# what every fairseq transformer layer uses — required for reference-
# checkpoint interop parity (tests/test_interop.py)
def sinusoidal_positions(max_len: int, dim: int, offset: int = 2) -> np.ndarray:
    """fairseq-style sinusoidal embeddings (pad-offset positions)."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    pos = np.arange(offset, max_len + offset)[:, None] * freqs[None, :]
    out = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        out = np.concatenate([out, np.zeros((max_len, 1))], axis=1)
    return out.astype(np.float32)


def get_activation_fn(name: str):
    """fairseq ``--activation-fn`` registry (``fairseq/utils.py``
    ``get_available_activation_fns``): relu (default), gelu (exact erf),
    gelu_accurate (tanh approximation), relu_squared, tanh, linear."""
    table = {
        "relu": jax.nn.relu,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_fast": lambda x: jax.nn.gelu(x, approximate=True),
        "gelu_accurate": lambda x: jax.nn.gelu(x, approximate=True),
        "relu_squared": lambda x: jnp.square(jax.nn.relu(x)),
        "tanh": jnp.tanh,
        "linear": lambda x: x,
    }
    if name not in table:
        raise ValueError(f"unknown activation {name!r} "
                         f"(choices: {sorted(table)})")
    return table[name]


def _run_layer(layer, arrays, *, remat, layerdrop, parent, deterministic):
    """Apply one transformer layer through the runtime-substrate wrappers.

    - ``remat`` (``--checkpoint-activations``; reference
      ``transformer_config.py:165`` + ``modules/checkpoint_activations.py``):
      wraps the call in ``nn.remat`` so the backward pass rematerializes the
      layer instead of storing its activations — the TPU-native form of the
      reference's ``checkpoint_wrapper`` (trade one extra forward per layer
      for O(depth) activation HBM).  Applied only in training; eval has no
      backward to save for.
    - ``layerdrop`` (fairseq ``LayerDropModuleList``,
      ``transformer_encoder.py:91-92``): in training the whole layer is
      skipped (identity) with probability p, one draw per layer per forward
      shared across the batch.  Under jit the layer is still traced and
      computed — data-dependent compute skipping would require dynamic
      shapes — so the skip is a select on its output, which preserves the
      reference's math (a dropped layer IS the identity) at static shapes.

    ``arrays`` are positional array arguments (differentiated through the
    remat boundary); everything static rides the ``deterministic`` closure.
    """
    def apply(mdl, *xs):
        return mdl(*xs, deterministic=deterministic)

    if remat and not deterministic:
        apply = nn.remat(apply)
    out = apply(layer, *arrays)
    if layerdrop > 0.0 and not deterministic:
        keep = (jax.random.uniform(parent.make_rng("dropout"), ())
                >= layerdrop)
        out = jnp.where(keep, out, arrays[0])
    return out


class CrossAttention(nn.Module):
    """Exact softmax encoder-decoder attention with static encoder kv."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    q_noise: float = 0.0
    qn_block_size: int = 8

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads

    def setup(self):
        from efficient_attention_tpu.models.quant_noise import dense

        init = nn.initializers.xavier_uniform()
        qn = (self.q_noise, self.qn_block_size)
        self.q_proj = dense(self.embed_dim, *qn, kernel_init=init)
        self.k_proj = dense(self.embed_dim, *qn, kernel_init=init)
        self.v_proj = dense(self.embed_dim, *qn, kernel_init=init)
        self.out_proj = dense(self.embed_dim, *qn, kernel_init=init)
        self.attn_dropout = nn.Dropout(self.dropout)

    def _split(self, x, B):
        return jnp.swapaxes(
            x.reshape(B, -1, self.num_heads, self.head_dim), 1, 2)

    def __call__(self, x, enc_out, enc_padding_mask=None, deterministic=True,
                 return_attn=False):
        from efficient_attention_tpu.models.quant_noise import qn_call

        B = x.shape[0]
        q = self._split(qn_call(self.q_proj, x, deterministic), B)
        k = self._split(qn_call(self.k_proj, enc_out, deterministic), B)
        v = self._split(qn_call(self.v_proj, enc_out, deterministic), B)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * self.head_dim**-0.5
        if enc_padding_mask is not None:
            logits = jnp.where(
                enc_padding_mask[:, None, None, :].astype(bool), MASK_VAL, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, -1, self.embed_dim)
        out = qn_call(self.out_proj, out, deterministic)
        if return_attn:
            # head-averaged weights, the fairseq ``need_attn`` convention
            # (generation alignment; ``transformer_layer.py`` attn output)
            return out, jnp.mean(attn, axis=1)
        return out

    # ----- incremental decoding (fairseq ``static_kv`` semantics:
    # ``transformer_layer.py:435-450`` passes static_kv=True so
    # ``multihead_attention.py:199-280`` projects the encoder K/V ONCE per
    # sentence and replays the saved tensors at every decode step) -----
    def precompute_kv(self, enc_out):
        """Project encoder states to split-head K/V ``[B, H, S, D]`` once;
        the pair lives in the decode-state pytree and is reordered by beam
        gathers like any other cache entry."""
        B = enc_out.shape[0]
        return (self._split(self.k_proj(enc_out), B),
                self._split(self.v_proj(enc_out), B))

    def decode_step(self, x, cached_k, cached_v, enc_padding_mask=None):
        """One-token cross-attention using the precomputed encoder K/V —
        only the query projection runs per step."""
        B = x.shape[0]
        q = self._split(self.q_proj(x), B)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, cached_k,
                            preferred_element_type=jnp.float32)
        logits = logits * self.head_dim**-0.5
        if enc_padding_mask is not None:
            logits = jnp.where(
                enc_padding_mask[:, None, None, :].astype(bool), MASK_VAL,
                logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, cached_v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, -1, self.embed_dim)
        return self.out_proj(out)


class KVCache(NamedTuple):
    """Fixed-capacity decoder KV cache."""

    k: Array  # [B, H, L, D]
    v: Array
    pos: Array  # scalar


class CausalSelfAttention(nn.Module):
    """Exact softmax causal self-attention with a fixed-shape decode cache
    (the decoder baseline, ``fairseq MultiheadAttention`` semantics)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    q_noise: float = 0.0
    qn_block_size: int = 8

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads

    def setup(self):
        from efficient_attention_tpu.models.quant_noise import dense

        init = nn.initializers.variance_scaling(0.5, "fan_avg", "uniform")
        qn = (self.q_noise, self.qn_block_size)
        self.q_proj = dense(self.embed_dim, *qn, kernel_init=init)
        self.k_proj = dense(self.embed_dim, *qn, kernel_init=init)
        self.v_proj = dense(self.embed_dim, *qn, kernel_init=init)
        self.out_proj = dense(
            self.embed_dim, *qn,
            kernel_init=nn.initializers.xavier_uniform())
        self.attn_dropout = nn.Dropout(self.dropout)

    def _split(self, x, B):
        return jnp.swapaxes(
            x.reshape(B, -1, self.num_heads, self.head_dim), 1, 2)

    def __call__(self, x, key_padding_mask=None, deterministic=True):
        from efficient_attention_tpu.models.quant_noise import qn_call

        B, T, _ = x.shape
        q = self._split(qn_call(self.q_proj, x, deterministic), B)
        k = self._split(qn_call(self.k_proj, x, deterministic), B)
        v = self._split(qn_call(self.v_proj, x, deterministic), B)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * self.head_dim**-0.5
        from efficient_attention_tpu.ops.misc import future_mask

        causal = jnp.asarray(np.isneginf(future_mask(T)))
        logits = jnp.where(causal[None, None], MASK_VAL, logits)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :].astype(bool), MASK_VAL, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, T, self.embed_dim)
        return qn_call(self.out_proj, out, deterministic)

    def init_decode_state(self, batch_size, max_len, dtype=jnp.float32):
        shape = (batch_size, self.num_heads, max_len, self.head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       jnp.zeros((), jnp.int32))

    def decode_step(self, state: KVCache, x):
        B = x.shape[0]
        q = self._split(self.q_proj(x), B)
        k = self._split(self.k_proj(x), B)
        v = self._split(self.v_proj(x), B)
        ks = jax.lax.dynamic_update_slice_in_dim(state.k, k, state.pos, axis=2)
        vs = jax.lax.dynamic_update_slice_in_dim(state.v, v, state.pos, axis=2)
        logits = jnp.einsum("bhod,bhsd->bhos", q, ks,
                            preferred_element_type=jnp.float32)
        logits = logits * self.head_dim**-0.5
        valid = jnp.arange(ks.shape[2]) <= state.pos
        logits = jnp.where(valid[None, None, None], logits, MASK_VAL)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhos,bhsd->bhod", attn, vs)
        out = jnp.swapaxes(out, 1, 2).reshape(B, 1, self.embed_dim)
        return self.out_proj(out), KVCache(ks, vs, state.pos + 1)


class EncoderLayer(nn.Module):
    """Pre/post-LN encoder layer with factory-built efficient self-attention
    (the fork's ``EfficientAttention`` bridge, ``efficient_attention.py:54-131``
    — our stack is batch-first so no transposes are needed)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    attn_name: str = "softmax"
    attn_args: Dict[str, Any] = field(default_factory=dict)
    dropout: float = 0.1
    activation_dropout: float = 0.0
    normalize_before: bool = False
    activation_fn: str = "relu"
    # ``--quant-noise-pq`` / ``--quant-noise-pq-block-size`` (iPQ
    # quantization noise on fc1/fc2, ``fairseq/modules/quant_noise.py``).
    # Scope matches the FORK, not upstream fairseq: the fork's encoder
    # self-attention is ``EfficientAttention``, whose constructor accepts
    # q_noise but never applies it (``modules/efficient_attention.py:38``
    # — the factory-built zoo modules have plain Linears), so encoder
    # attention projections stay noise-free here too.
    quant_noise_pq: float = 0.0
    quant_noise_pq_block_size: int = 8

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        from efficient_attention_tpu.models.quant_noise import dense, qn_call

        attn = AttentionFactory.build_attention(
            self.attn_name,
            {**self.attn_args, "dim": self.embed_dim,
             "num_heads": self.num_heads, "attn_drop": self.dropout,
             "proj_drop": 0.0})
        ln1, ln2 = nn.LayerNorm(epsilon=1e-5), nn.LayerNorm(epsilon=1e-5)
        residual = x
        if self.normalize_before:
            x = ln1(x)
        x = attn(x, key_padding_mask=key_padding_mask,
                 deterministic=deterministic)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = ln1(x)
        residual = x
        if self.normalize_before:
            x = ln2(x)
        qn = (self.quant_noise_pq, self.quant_noise_pq_block_size)
        # explicit names keep the param layout identical to the plain
        # nn.Dense auto-names, so enabling quant noise never changes the
        # checkpoint structure
        x = qn_call(dense(self.ffn_dim, *qn, name="Dense_0"), x,
                    deterministic)
        x = get_activation_fn(self.activation_fn)(x)
        x = nn.Dropout(self.activation_dropout)(x, deterministic=deterministic)
        x = qn_call(dense(self.embed_dim, *qn, name="Dense_1"), x,
                    deterministic)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = ln2(x)
        return x


class DecoderLayer(nn.Module):
    """Decoder layer: {causal_eva | softmax} self-attn + softmax cross-attn
    (``transformer_layer.py:295-331``)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    attn_name: str = "softmax"
    attn_args: Dict[str, Any] = field(default_factory=dict)
    dropout: float = 0.1
    activation_dropout: float = 0.0
    normalize_before: bool = False
    has_cross: bool = True
    # sequence parallelism (mesh axis name; requires causal_eva self-attn
    # and running inside shard_map — parallel/seq_parallel.py)
    seq_axis: Optional[str] = None
    activation_fn: str = "relu"
    # iPQ quantization noise (``--quant-noise-pq``): applied to fc1/fc2
    # and every attention projection, as in fairseq's decoder layer
    quant_noise_pq: float = 0.0
    quant_noise_pq_block_size: int = 8

    def setup(self):
        from efficient_attention_tpu.models.quant_noise import dense

        if self.attn_name == "causal_eva":
            self.self_attn = CausalEVAttention(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dropout=self.dropout, causal=True, seq_axis=self.seq_axis,
                q_noise=self.quant_noise_pq,
                qn_block_size=self.quant_noise_pq_block_size,
                **{k: v for k, v in self.attn_args.items()
                   if k in ("window_size", "overlap_window", "num_chunks",
                            "chunk_size", "adaptive_proj", "use_t5_rpe",
                            "impl")})
        elif self.attn_name == "softmax":
            if self.seq_axis is not None:
                raise NotImplementedError(
                    "sequence parallelism requires causal_eva decoder "
                    "self-attention (softmax attends across shards)")
            self.self_attn = CausalSelfAttention(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dropout=self.dropout, q_noise=self.quant_noise_pq,
                qn_block_size=self.quant_noise_pq_block_size)
        else:
            raise NotImplementedError(
                f"decoder attention {self.attn_name} (reference supports "
                "causal_eva and softmax, transformer_layer.py:295-321)")
        self.ln_self = nn.LayerNorm(epsilon=1e-5)
        if self.has_cross:
            self.cross_attn = CrossAttention(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dropout=self.dropout, q_noise=self.quant_noise_pq,
                qn_block_size=self.quant_noise_pq_block_size)
            self.ln_cross = nn.LayerNorm(epsilon=1e-5)
        qn = (self.quant_noise_pq, self.quant_noise_pq_block_size)
        self.fc1 = dense(self.ffn_dim, *qn)
        self.fc2 = dense(self.embed_dim, *qn)
        self.ln_ffn = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout)
        self.act_drop = nn.Dropout(self.activation_dropout)

    def _self_attn_full(self, x, key_padding_mask, deterministic):
        if self.attn_name == "causal_eva":
            return self.self_attn(x, key_padding_mask=key_padding_mask,
                                  deterministic=deterministic)
        return self.self_attn(x, key_padding_mask=key_padding_mask,
                              deterministic=deterministic)

    def __call__(self, x, enc_out=None, enc_padding_mask=None,
                 self_padding_mask=None, deterministic=True,
                 need_attn=False):
        attn_weights = None
        residual = x
        if self.normalize_before:
            x = self.ln_self(x)
        x = self._self_attn_full(x, self_padding_mask, deterministic)
        x = self.drop(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.ln_self(x)
        if self.has_cross and enc_out is not None:
            residual = x
            if self.normalize_before:
                x = self.ln_cross(x)
            if need_attn:
                x, attn_weights = self.cross_attn(
                    x, enc_out, enc_padding_mask,
                    deterministic=deterministic, return_attn=True)
            else:
                x = self.cross_attn(x, enc_out, enc_padding_mask,
                                    deterministic=deterministic)
            x = self.drop(x, deterministic=deterministic)
            x = residual + x
            if not self.normalize_before:
                x = self.ln_cross(x)
        residual = x
        if self.normalize_before:
            x = self.ln_ffn(x)
        from efficient_attention_tpu.models.quant_noise import qn_call

        x = get_activation_fn(self.activation_fn)(
            qn_call(self.fc1, x, deterministic))
        x = self.act_drop(x, deterministic=deterministic)
        x = qn_call(self.fc2, x, deterministic)
        x = self.drop(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.ln_ffn(x)
        if need_attn:
            return x, attn_weights
        return x

    # ----- incremental decoding -----
    def init_decode_state(self, batch_size, max_len, dtype=jnp.float32,
                          enc_out=None):
        """Self-attention cache, plus (with ``enc_out``) the fairseq
        ``static_kv`` analogue: cross-attention K/V projected ONCE here and
        carried in the state pytree so decode steps never re-project the
        encoder output (reference ``transformer_layer.py:435-450``,
        ``multihead_attention.py:199-280``)."""
        self_state = self.self_attn.init_decode_state(
            batch_size, max_len, dtype)
        if enc_out is None or not self.has_cross:
            return self_state
        return (self_state, self.cross_attn.precompute_kv(enc_out))

    def decode_step(self, state, x, enc_out=None, enc_padding_mask=None):
        cross_kv = None
        if isinstance(state, tuple) and len(state) == 2 \
                and not hasattr(state, "_fields"):
            state, cross_kv = state
        residual = x
        if self.normalize_before:
            x = self.ln_self(x)
        x, state = self.self_attn.decode_step(state, x)
        x = residual + x
        if not self.normalize_before:
            x = self.ln_self(x)
        if self.has_cross and (cross_kv is not None or enc_out is not None):
            residual = x
            if self.normalize_before:
                x = self.ln_cross(x)
            if cross_kv is not None:
                x = self.cross_attn.decode_step(
                    x, cross_kv[0], cross_kv[1], enc_padding_mask)
            else:
                x = self.cross_attn(x, enc_out, enc_padding_mask,
                                    deterministic=True)
            x = residual + x
            if not self.normalize_before:
                x = self.ln_cross(x)
        residual = x
        if self.normalize_before:
            x = self.ln_ffn(x)
        x = self.fc2(get_activation_fn(self.activation_fn)(self.fc1(x)))
        x = residual + x
        if not self.normalize_before:
            x = self.ln_ffn(x)
        if cross_kv is not None:
            # keep the static K/V in the state pytree for the next step
            return x, (state, cross_kv)
        return x, state


class TransformerEncoder(nn.Module):
    """Embed -> layers -> (LN) (``fairseq TransformerEncoder``)."""

    vocab_size: int
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    attn_name: str = "softmax"
    attn_args: Dict[str, Any] = field(default_factory=dict)
    dropout: float = 0.1
    max_len: int = 1024
    normalize_before: bool = False
    pad_idx: int = 1
    learned_pos: bool = False
    activation_fn: str = "relu"
    # shared encoder/decoder embedding (``--share-all-embeddings``): the
    # parent model creates the Embed once and passes the bound module down
    embed_module: Optional[nn.Module] = None
    # ``--checkpoint-activations`` (reference
    # ``transformer_config.py:165``, ``checkpoint_activations.py``):
    # rematerialize each layer in the backward instead of storing its
    # activations — the TPU form is ``nn.remat`` (jax.checkpoint), which
    # trades one extra forward per layer for O(depth) activation HBM
    checkpoint_activations: bool = False
    # ``--encoder-layerdrop`` (fairseq ``LayerDropModuleList``,
    # ``transformer_encoder.py:91-92``): during training each layer is
    # skipped — as a whole, per forward — with this probability; eval
    # always runs every layer
    layerdrop: float = 0.0
    quant_noise_pq: float = 0.0
    quant_noise_pq_block_size: int = 8

    def setup(self):
        if self.embed_module is not None:
            self.embed_tokens = self.embed_module
        else:
            self.embed_tokens = nn.Embed(
                self.vocab_size, self.embed_dim,
                embedding_init=nn.initializers.normal(self.embed_dim**-0.5))
        self.embed_scale = math.sqrt(self.embed_dim)
        if self.learned_pos:
            # fairseq LearnedPositionalEmbedding (``--encoder-learned-pos``,
            # ``modules/learned_positional_embedding.py``): padding-aware —
            # positions are pad_idx + cumsum(non-pad), table rows
            # 0..pad_idx are reserved (fairseq table size is
            # num_embeddings + padding_idx + 1)
            self._pos = self.param(
                "embed_positions", nn.initializers.normal(0.02),
                (self.max_len + self.pad_idx + 1, self.embed_dim))
        else:
            self._pos = jnp.asarray(
                sinusoidal_positions(self.max_len, self.embed_dim))
        self.embed_dropout = nn.Dropout(self.dropout)
        self.layers = [
            EncoderLayer(
                embed_dim=self.embed_dim, ffn_dim=self.ffn_dim,
                num_heads=self.num_heads, attn_name=self.attn_name,
                attn_args=dict(self.attn_args), dropout=self.dropout,
                normalize_before=self.normalize_before,
                activation_fn=self.activation_fn,
                quant_noise_pq=self.quant_noise_pq,
                quant_noise_pq_block_size=self.quant_noise_pq_block_size,
                name=f"layer_{i}")
            for i in range(self.num_layers)]
        if self.normalize_before:
            self.final_ln = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, src_tokens, deterministic=True):
        B, T = src_tokens.shape
        padding_mask = src_tokens == self.pad_idx
        x = self.embed_tokens(src_tokens) * self.embed_scale
        if self.learned_pos:
            # fairseq make_positions: pad_idx + running count of non-pad
            # tokens; pads map to the reserved pad_idx row
            keep = (~padding_mask).astype(jnp.int32)
            positions = jnp.cumsum(keep, axis=1) * keep + self.pad_idx
            x = x + self._pos[positions].astype(x.dtype)
        else:
            # cast the f32 sinusoidal table to the activation dtype — the
            # add must not silently promote a bf16 stream to f32
            x = x + self._pos[:T][None].astype(x.dtype)
        x = self.embed_dropout(x, deterministic=deterministic)
        for layer in self.layers:
            x = _run_layer(
                layer, (x, padding_mask),
                remat=self.checkpoint_activations,
                layerdrop=self.layerdrop, parent=self,
                deterministic=deterministic)
        if self.normalize_before:
            x = self.final_ln(x)
        return x, padding_mask


class TransformerDecoder(nn.Module):
    """Decoder with optional cross-attention (LM when ``has_cross=False``)."""

    vocab_size: int
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    attn_name: str = "softmax"
    attn_args: Dict[str, Any] = field(default_factory=dict)
    dropout: float = 0.1
    max_len: int = 1024
    normalize_before: bool = False
    pad_idx: int = 1
    has_cross: bool = True
    share_input_output_embed: bool = True
    # static promise that token blocks contain no pads (wiki103 recipe:
    # TokenBlockDataset 'none' break mode packs a dense stream).  fairseq's
    # decoder drops the self-attn padding mask whenever no pad is present
    # (``transformer_decoder.py``: ``if prev_output_tokens.eq(pad).any()``)
    # — a data-dependent branch jit cannot express, so the dense-pipeline
    # caller asserts it statically.  A vacuous all-False mask is NOT free
    # here: its mere presence (had_mask) disqualifies the packed causal-EVA
    # kernel inside the train step.
    dense_tokens: bool = False
    # adaptive input embeddings (wiki103 recipe, ``transformer_lm.py:406``;
    # fairseq ``modules/adaptive_input.py``)
    adaptive_input_cutoffs: Optional[Tuple[int, ...]] = None
    # fairseq ``no_decoder_final_norm`` (wiki103 sets it: normalize_before
    # WITHOUT a final decoder LayerNorm, ``transformer_lm.py`` arch)
    final_norm: bool = True
    # encoder/decoder embedding sharing (``--share-all-embeddings``): the
    # parent creates the Embed and passes the bound module down
    embed_module: Optional[nn.Module] = None
    # sequence parallelism (mesh axis name): layers route causal-EVA
    # attention through parallel/seq_parallel.py; the positional slice is
    # offset by this shard's global token offset
    seq_axis: Optional[str] = None
    # BASE-layer MoE (``--base-layers``, reference transformer_lm.py:187-195,
    # transformer_decoder.py:166-171)
    base_layers: int = 0
    base_experts: int = 0
    base_sublayers: int = 1
    base_shuffle: bool = False
    # ``--checkpoint-activations`` / ``--decoder-layerdrop`` (see
    # ``_run_layer``)
    checkpoint_activations: bool = False
    layerdrop: float = 0.0
    quant_noise_pq: float = 0.0
    quant_noise_pq_block_size: int = 8
    learned_pos: bool = False
    activation_fn: str = "relu"

    def setup(self):
        if self.embed_module is not None:
            self.embed_tokens = self.embed_module
        elif self.adaptive_input_cutoffs is not None:
            from efficient_attention_tpu.models.adaptive_softmax import (
                AdaptiveInput,
            )

            self.embed_tokens = AdaptiveInput(
                vocab_size=self.vocab_size, embed_dim=self.embed_dim,
                cutoffs=tuple(self.adaptive_input_cutoffs))
        else:
            self.embed_tokens = nn.Embed(
                self.vocab_size, self.embed_dim,
                embedding_init=nn.initializers.normal(self.embed_dim**-0.5))
        self.embed_scale = math.sqrt(self.embed_dim)
        if self.learned_pos:
            # fairseq LearnedPositionalEmbedding (``--decoder-learned-pos``):
            # padding-aware positions with the pad_idx+1 offset and the
            # fairseq table layout (rows 0..pad_idx reserved), so reference
            # learned-pos checkpoints map 1:1 (ADVICE r3)
            self._pos = self.param(
                "embed_positions", nn.initializers.normal(0.02),
                (self.max_len + self.pad_idx + 1, self.embed_dim))
        else:
            self._pos = jnp.asarray(
                sinusoidal_positions(self.max_len, self.embed_dim))
        self.embed_dropout = nn.Dropout(self.dropout)
        self.layers = [
            DecoderLayer(
                embed_dim=self.embed_dim, ffn_dim=self.ffn_dim,
                num_heads=self.num_heads, attn_name=self.attn_name,
                attn_args=dict(self.attn_args), dropout=self.dropout,
                normalize_before=self.normalize_before,
                has_cross=self.has_cross, seq_axis=self.seq_axis,
                activation_fn=self.activation_fn,
                quant_noise_pq=self.quant_noise_pq,
                quant_noise_pq_block_size=self.quant_noise_pq_block_size,
                name=f"layer_{i}")
            for i in range(self.num_layers)]
        if self.normalize_before and self.final_norm:
            self.final_ln = nn.LayerNorm(epsilon=1e-5)
        if (not self.share_input_output_embed
                and self.adaptive_input_cutoffs is None):
            self.output_projection = nn.Dense(self.vocab_size, use_bias=False)
        if self.base_layers:
            from efficient_attention_tpu.models.base_layer import (
                BaseLayer,
                base_layer_positions,
            )

            self._base_after = base_layer_positions(
                self.num_layers, self.base_layers)
            self.base_mods = [
                BaseLayer(dim=self.embed_dim, ffn_dim=self.ffn_dim,
                          num_experts=self.base_experts,
                          sublayers=self.base_sublayers,
                          shuffle=self.base_shuffle, name=f"base_{i}")
                for i in range(self.base_layers)]
        else:
            self._base_after = []
            self.base_mods = []

    def _run_base(self, x, bi, after_n_layers, deterministic):
        """Run any BASE layers scheduled after ``after_n_layers`` decoder
        layers; returns (x, next base index)."""
        while (bi < len(self._base_after)
               and self._base_after[bi] == after_n_layers):
            x = self.base_mods[bi](x, deterministic=deterministic)
            bi += 1
        return x, bi

    def _output_layer(self, x):
        if self.adaptive_input_cutoffs is not None:
            raise ValueError(
                "adaptive-input decoders emit features; the output layer is "
                "the (tied) adaptive softmax on TransformerLM")
        if self.share_input_output_embed:
            return x @ self.embed_tokens.embedding.T
        return self.output_projection(x)

    def _embed(self, tokens, pos_offset=0):
        T = tokens.shape[1]
        x = self.embed_tokens(tokens) * self.embed_scale
        if self.learned_pos:
            # fairseq make_positions (padding-aware, pad_idx+1 offset);
            # pos_offset carries the already-consumed token count for
            # incremental decode / sequence-parallel shards, where blocks
            # are dense so cumsum+offset equals the global position
            keep = (tokens != self.pad_idx).astype(jnp.int32)
            positions = ((jnp.cumsum(keep, axis=1) + pos_offset) * keep
                         + self.pad_idx)
            return x + self._pos[positions].astype(x.dtype)
        pos = jax.lax.dynamic_slice_in_dim(self._pos, pos_offset, T, axis=0)
        # keep the activation dtype (the f32 table would promote bf16)
        return x + pos[None].astype(x.dtype)

    def __call__(self, prev_output_tokens, enc_out=None, enc_padding_mask=None,
                 deterministic=True, features_only=False):
        if self.seq_axis is not None:
            # sequence-parallel: LM token blocks are dense (TokenBlock
            # packing), so no padding mask crosses shards; positions are
            # offset by this shard's global token offset
            padding_mask = None
            offset = (jax.lax.axis_index(self.seq_axis)
                      * prev_output_tokens.shape[1])
            x = self._embed(prev_output_tokens, pos_offset=offset)
        elif self.dense_tokens:
            # the pipeline guarantees no pads (see the attribute comment);
            # a traced all-False mask would disqualify the packed kernel
            padding_mask = None
            x = self._embed(prev_output_tokens)
        else:
            padding_mask = prev_output_tokens == self.pad_idx
            x = self._embed(prev_output_tokens)
        x = self.embed_dropout(x, deterministic=deterministic)
        bi = 0
        for j, layer in enumerate(self.layers):
            x, bi = self._run_base(x, bi, j, deterministic)
            x = _run_layer(
                layer, (x, enc_out, enc_padding_mask, padding_mask),
                remat=self.checkpoint_activations,
                layerdrop=self.layerdrop, parent=self,
                deterministic=deterministic)
        x, bi = self._run_base(x, bi, self.num_layers, deterministic)
        if self.normalize_before and self.final_norm:
            x = self.final_ln(x)
        if features_only:
            return x
        return self._output_layer(x)

    def forward_with_alignment(self, prev_output_tokens, enc_out,
                               enc_padding_mask=None):
        """Eval-only forward that also returns the LAST layer's
        head-averaged cross-attention ``[B, T, S]`` — the fairseq
        ``need_attn`` convention feeding ``--print-alignment``."""
        padding_mask = prev_output_tokens == self.pad_idx
        x = self._embed(prev_output_tokens)
        attn = None
        for j, layer in enumerate(self.layers):
            need = j == self.num_layers - 1
            out = layer(x, enc_out, enc_padding_mask, padding_mask,
                        True, need)
            x, attn = out if need else (out, attn)
        if self.normalize_before and self.final_norm:
            x = self.final_ln(x)
        return self._output_layer(x), attn

    # ----- incremental decoding -----
    def init_decode_state(self, batch_size, max_len, dtype=jnp.float32,
                          enc_out=None):
        """With ``enc_out``, each layer's cross-attention K/V is projected
        ONCE here (fairseq ``static_kv``) and decode steps skip the two
        ``[B*K, SRC, D]`` projections per layer per token."""
        return [layer.init_decode_state(batch_size, max_len, dtype,
                                        enc_out=enc_out)
                for layer in self.layers]

    def decode_step(self, states, tokens, pos, enc_out=None,
                    enc_padding_mask=None, features_only=False):
        """One decode step. tokens: [B, 1]; pos: scalar step index."""
        x = self._embed(tokens, pos_offset=pos)
        new_states = []
        bi = 0
        for j, (layer, st) in enumerate(zip(self.layers, states)):
            x, bi = self._run_base(x, bi, j, True)
            x, st = layer.decode_step(st, x, enc_out=enc_out,
                                      enc_padding_mask=enc_padding_mask)
            new_states.append(st)
        x, bi = self._run_base(x, bi, self.num_layers, True)
        if self.normalize_before and self.final_norm:
            x = self.final_ln(x)
        if features_only:
            return x, new_states
        return self._output_layer(x), new_states


class TransformerModel(nn.Module):
    """Encoder-decoder MT model (``transformer_wmt_en_de`` shape:
    6+6 layers, d=512, ffn=2048, 8 heads, ``transformer_legacy.py:237-238``)."""

    src_vocab_size: int
    tgt_vocab_size: int
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_layers: int = 6
    # decoder depth when different from the encoder's
    # (``--decoder-layers``; fairseq configures the two independently)
    num_decoder_layers: Optional[int] = None
    num_heads: int = 8
    attn_name_encoder: str = "softmax"
    attn_args_encoder: Dict[str, Any] = field(default_factory=dict)
    attn_name_decoder: str = "softmax"
    attn_args_decoder: Dict[str, Any] = field(default_factory=dict)
    dropout: float = 0.1
    max_len: int = 1024
    pad_idx: int = 1
    # ``--share-all-embeddings`` (the WMT recipe, reference main.sh:148):
    # one embedding table shared by encoder input, decoder input, and the
    # decoder output projection (requires a joint vocabulary)
    share_all_embeddings: bool = False
    checkpoint_activations: bool = False
    encoder_layerdrop: float = 0.0
    decoder_layerdrop: float = 0.0
    quant_noise_pq: float = 0.0
    quant_noise_pq_block_size: int = 8
    activation_fn: str = "relu"
    encoder_learned_pos: bool = False
    decoder_learned_pos: bool = False

    def setup(self):
        shared = None
        if self.share_all_embeddings:
            if self.src_vocab_size != self.tgt_vocab_size:
                raise ValueError(
                    "--share-all-embeddings requires a joint vocabulary")
            shared = nn.Embed(
                self.src_vocab_size, self.embed_dim,
                embedding_init=nn.initializers.normal(self.embed_dim**-0.5),
                name="shared_embed")
        self.encoder = TransformerEncoder(
            vocab_size=self.src_vocab_size, embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim, num_layers=self.num_layers,
            num_heads=self.num_heads, attn_name=self.attn_name_encoder,
            attn_args=dict(self.attn_args_encoder), dropout=self.dropout,
            max_len=self.max_len, pad_idx=self.pad_idx,
            embed_module=shared,
            checkpoint_activations=self.checkpoint_activations,
            layerdrop=self.encoder_layerdrop,
            quant_noise_pq=self.quant_noise_pq,
            quant_noise_pq_block_size=self.quant_noise_pq_block_size,
            activation_fn=self.activation_fn,
            learned_pos=self.encoder_learned_pos)
        self.decoder = TransformerDecoder(
            vocab_size=self.tgt_vocab_size, embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim,
            num_layers=(self.num_layers if self.num_decoder_layers is None
                        else self.num_decoder_layers),
            num_heads=self.num_heads, attn_name=self.attn_name_decoder,
            attn_args=dict(self.attn_args_decoder), dropout=self.dropout,
            max_len=self.max_len, pad_idx=self.pad_idx, has_cross=True,
            embed_module=shared,
            checkpoint_activations=self.checkpoint_activations,
            layerdrop=self.decoder_layerdrop,
            quant_noise_pq=self.quant_noise_pq,
            quant_noise_pq_block_size=self.quant_noise_pq_block_size,
            activation_fn=self.activation_fn,
            learned_pos=self.decoder_learned_pos)

    def __call__(self, src_tokens, prev_output_tokens, deterministic=True):
        enc_out, enc_padding = self.encoder(src_tokens,
                                            deterministic=deterministic)
        return self.decoder(prev_output_tokens, enc_out=enc_out,
                            enc_padding_mask=enc_padding,
                            deterministic=deterministic)

    def encode(self, src_tokens):
        return self.encoder(src_tokens, deterministic=True)

    def forward_with_alignment(self, src_tokens, prev_output_tokens):
        """(logits, last-layer cross-attn [B, T, S]) for
        ``generate --print-alignment`` (teacher forcing over a chosen
        hypothesis)."""
        enc_out, enc_padding = self.encoder(src_tokens, deterministic=True)
        return self.decoder.forward_with_alignment(
            prev_output_tokens, enc_out, enc_padding)

    def init_decode_state(self, batch_size, max_len, dtype=jnp.float32,
                          enc_out=None):
        return self.decoder.init_decode_state(batch_size, max_len, dtype,
                                              enc_out=enc_out)

    def decode_step(self, states, tokens, pos, enc_out, enc_padding_mask):
        """``enc_out`` may be None when the state was initialized with
        ``init_decode_state(..., enc_out=...)`` (static-KV caching)."""
        return self.decoder.decode_step(states, tokens, pos, enc_out,
                                        enc_padding_mask)


class TransformerLM(nn.Module):
    """Decoder-only LM (``transformer_lm_wiki103`` shape: 16 layers, d=1024,
    ffn=4096, 8 heads, adaptive input/softmax in the full recipe —
    ``transformer_lm.py:406``; adaptive softmax lives in
    ``models/adaptive_softmax.py`` here)."""

    vocab_size: int
    embed_dim: int = 1024
    ffn_dim: int = 4096
    num_layers: int = 16
    num_heads: int = 8
    attn_name: str = "softmax"
    attn_args: Dict[str, Any] = field(default_factory=dict)
    dropout: float = 0.1
    max_len: int = 3072
    pad_idx: int = 1
    adaptive_cutoffs: Optional[Tuple[int, ...]] = None
    # the published wiki103 configuration (``transformer_lm_wiki103``):
    # adaptive INPUT embeddings with the adaptive softmax fully tied to them
    # (tie_adaptive_weights + tie_adaptive_proj) and NO final decoder LN
    # (no_decoder_final_norm)
    adaptive_input: bool = False
    tie_adaptive: bool = True
    final_norm: bool = True
    seq_axis: Optional[str] = None
    base_layers: int = 0
    base_experts: int = 0
    base_sublayers: int = 1
    base_shuffle: bool = False
    checkpoint_activations: bool = False
    layerdrop: float = 0.0
    quant_noise_pq: float = 0.0
    quant_noise_pq_block_size: int = 8
    activation_fn: str = "relu"
    learned_pos: bool = False
    # dense TokenBlock pipeline (no pads): see TransformerDecoder.dense_tokens
    dense_tokens: bool = False

    def setup(self):
        self.decoder = TransformerDecoder(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim, num_layers=self.num_layers,
            num_heads=self.num_heads, attn_name=self.attn_name,
            attn_args=dict(self.attn_args), dropout=self.dropout,
            max_len=self.max_len, pad_idx=self.pad_idx, has_cross=False,
            normalize_before=True, final_norm=self.final_norm,
            seq_axis=self.seq_axis,
            adaptive_input_cutoffs=(tuple(self.adaptive_cutoffs)
                                    if self.adaptive_input else None),
            base_layers=self.base_layers,
            base_experts=self.base_experts,
            base_sublayers=self.base_sublayers,
            base_shuffle=self.base_shuffle,
            checkpoint_activations=self.checkpoint_activations,
            layerdrop=self.layerdrop,
            quant_noise_pq=self.quant_noise_pq,
            quant_noise_pq_block_size=self.quant_noise_pq_block_size,
            activation_fn=self.activation_fn,
            learned_pos=self.learned_pos,
            dense_tokens=self.dense_tokens)
        if self.adaptive_cutoffs:
            from efficient_attention_tpu.models.adaptive_softmax import (
                AdaptiveSoftmax,
                TiedAdaptiveSoftmax,
            )

            if self.adaptive_input and self.tie_adaptive:
                self.adaptive_softmax = TiedAdaptiveSoftmax(
                    vocab_size=self.vocab_size, input_dim=self.embed_dim,
                    cutoffs=tuple(self.adaptive_cutoffs))
            else:
                self.adaptive_softmax = AdaptiveSoftmax(
                    vocab_size=self.vocab_size, input_dim=self.embed_dim,
                    cutoffs=tuple(self.adaptive_cutoffs))

    def _adaptive_band_weights(self):
        """Band (embedding, projection-kernel) arrays of the decoder's
        AdaptiveInput, for the tied softmax."""
        ps = self.decoder.embed_tokens.variables["params"]
        n = sum(1 for k in ps if k.startswith("emb_"))
        embs = [ps[f"emb_{i}"]["embedding"] for i in range(n)]
        projs = [ps[f"proj_{i}"]["kernel"] for i in range(n)]
        return embs, projs

    def _log_prob(self, feats):
        if not self.adaptive_cutoffs:
            return jax.nn.log_softmax(self.decoder._output_layer(feats), -1)
        if self.adaptive_input and self.tie_adaptive:
            embs, projs = self._adaptive_band_weights()
            return self.adaptive_softmax.log_prob(feats, embs, projs)
        return self.adaptive_softmax.log_prob(feats)

    def __call__(self, tokens, deterministic=True, features_only=False):
        feats = self.decoder(tokens, deterministic=deterministic,
                             features_only=True)
        if features_only:
            return feats
        if self.adaptive_cutoffs:
            return self._log_prob(feats)
        return self.decoder._output_layer(feats)

    def loss(self, tokens, targets, deterministic=True):
        """Token-level NLL [B, T] (adaptive or full softmax)."""
        feats = self.decoder(tokens, deterministic=deterministic,
                             features_only=True)
        if self.adaptive_cutoffs:
            if self.adaptive_input and self.tie_adaptive:
                embs, projs = self._adaptive_band_weights()
                return self.adaptive_softmax.nll(feats, targets, embs, projs)
            return self.adaptive_softmax.nll(feats, targets)
        logits = self.decoder._output_layer(feats)
        return -jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), targets[..., None], axis=-1)[..., 0]

    def nll_from_features(self, feats, targets):
        """Token NLL from already-computed decoder features; lets callers
        chunk the output projection over tokens so at most
        ``[chunk, V]`` logits are live — the within-batch splitting of
        fairseq's ``SequenceScorer.batch_for_softmax``
        (``sequence_scorer.py``), which flattens ``B*T`` and slices."""
        if self.adaptive_cutoffs:
            if self.adaptive_input and self.tie_adaptive:
                embs, projs = self._adaptive_band_weights()
                return self.adaptive_softmax.nll(feats, targets, embs, projs)
            return self.adaptive_softmax.nll(feats, targets)
        logits = self.decoder._output_layer(feats).astype(jnp.float32)
        return -jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), targets[..., None], axis=-1)[..., 0]

    def init_decode_state(self, batch_size, max_len, dtype=jnp.float32):
        return self.decoder.init_decode_state(batch_size, max_len, dtype)

    def decode_step(self, states, tokens, pos):
        if self.adaptive_cutoffs:
            feats, states = self.decoder.decode_step(
                states, tokens, pos, features_only=True)
            return self._log_prob(feats), states
        return self.decoder.decode_step(states, tokens, pos)
