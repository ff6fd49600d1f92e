"""LightConv / DynamicConv model family (Wu et al., "Pay Less Attention
with Lightweight and Dynamic Convolutions").

TPU-native rebuild of ``fairseq/fairseq/modules/lightweight_convolution.py``,
``dynamic_convolution.py`` and the architecture glue in
``fairseq/fairseq/models/lightconv.py``.  The reference ships CUDA kernels
(``fairseq/modules/{lightconv,dynamicconv}_layer/``); on TPU both convs are
expressed as MXU/VPU-friendly dense ops:

  * LightweightConv: a depthwise convolution with head-shared,
    softmax-normalized kernels -> ``lax.conv_general_dilated`` with
    ``feature_group_count = channels`` (one dense depthwise conv).
  * DynamicConv: per-position kernels predicted from the token -> a stack
    of K shifted copies contracted with the predicted kernels in ONE einsum
    (no gather, no scan); K is small (3..31) so the unfold is cheap.

Causal use (decoders) sets ``padding_l = kernel_size - 1`` so position t
sees x[t-K+1 .. t] only — verified by the no-future-leak test.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efficient_attention_tpu.attention.base import trunc_normal_init

Array = jax.Array


def _unfold_shifted(x: Array, K: int, padding_l: int) -> Array:
    """[B, T, C] -> [B, T, K, C]; slot k holds x[t - padding_l + k]
    (zero outside), i.e. the K-tap window each output position reads."""
    B, T, C = x.shape
    pad_r = K - 1 - padding_l
    xp = jnp.pad(x, ((0, 0), (padding_l, max(pad_r, 0)), (0, 0)))
    return jnp.stack([xp[:, k:k + T] for k in range(K)], axis=2)


class LightweightConv(nn.Module):
    """Head-shared depthwise conv (``lightweight_convolution.py:45-135``).

    weight: [num_heads, K]; channel c uses head ``c // (C / H)``.
    """

    input_size: int
    kernel_size: int
    padding_l: int
    num_heads: int
    weight_softmax: bool = True
    weight_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        H, K, C = self.num_heads, self.kernel_size, self.input_size
        weight = self.param("weight", nn.initializers.xavier_uniform(),
                            (H, K))
        if self.weight_softmax:
            weight = jax.nn.softmax(weight, axis=-1)
        weight = nn.Dropout(self.weight_dropout)(
            weight, deterministic=deterministic)
        # expand head kernels to per-channel depthwise filters [K, 1, C]
        per_channel = jnp.repeat(weight, C // H, axis=0)  # [C, K]
        filt = jnp.swapaxes(per_channel, 0, 1)[:, None, :]  # [K, 1, C]
        pad_r = K - 1 - self.padding_l
        return jax.lax.conv_general_dilated(
            x, filt.astype(x.dtype),
            window_strides=(1,),
            padding=[(self.padding_l, max(pad_r, 0))],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C)


class DynamicConv(nn.Module):
    """Position-dependent conv (``dynamic_convolution.py:70-230``): kernels
    predicted per token by a linear layer, softmax-normalized over taps."""

    input_size: int
    kernel_size: int
    padding_l: int
    num_heads: int
    weight_softmax: bool = True
    weight_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        B, T, C = x.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = nn.Dense(H * K, kernel_init=nn.initializers.xavier_uniform(),
                     name="weight_linear")(x)  # [B, T, H*K]
        w = w.reshape(B, T, H, K)
        if self.weight_softmax:
            w = jax.nn.softmax(w, axis=-1)
        w = nn.Dropout(self.weight_dropout)(w, deterministic=deterministic)
        xs = _unfold_shifted(x, K, self.padding_l)  # [B, T, K, C]
        xs = xs.reshape(B, T, K, H, R)
        return jnp.einsum("bthk,btkhr->bthr", w, xs).reshape(B, T, C)


class LightConvLayer(nn.Module):
    """Encoder/decoder conv block (``models/lightconv.py:616-700``):
    GLU input proj -> {lightweight|dynamic} conv -> output proj, with
    residual + LN, followed by the usual FFN block."""

    embed_dim: int
    conv_dim: int
    ffn_dim: int
    kernel_size: int
    num_heads: int
    conv_type: str = "lightweight"  # or 'dynamic'
    causal: bool = False
    glu: bool = True
    weight_softmax: bool = True
    dropout: float = 0.1
    weight_dropout: float = 0.1
    relu_dropout: float = 0.0
    input_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.causal:
            padding_l = self.kernel_size - 1
        else:
            # 'same' padding; even kernels pad (K-1)//2 left (fairseq uses
            # (K-1)//2, K//2 for even K)
            padding_l = ((self.kernel_size // 2)
                         if self.kernel_size % 2 == 1
                         else (self.kernel_size - 1) // 2)
        residual = x
        h = nn.Dropout(self.input_dropout)(x, deterministic=deterministic)
        if self.glu:
            h = nn.Dense(2 * self.conv_dim, name="linear1")(h)
            h = nn.glu(h, axis=-1)
        else:
            h = nn.Dense(self.conv_dim, name="linear1")(h)
        conv_cls = (LightweightConv if self.conv_type == "lightweight"
                    else DynamicConv)
        h = conv_cls(
            input_size=self.conv_dim, kernel_size=self.kernel_size,
            padding_l=padding_l, num_heads=self.num_heads,
            weight_softmax=self.weight_softmax,
            weight_dropout=self.weight_dropout, name="conv",
        )(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dim, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(name="conv_ln")(residual + h)

        residual = x
        h = nn.relu(nn.Dense(self.ffn_dim, name="fc1")(x))
        h = nn.Dropout(self.relu_dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dim, name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="ffn_ln")(residual + h)


# per-layer kernel sizes of the published architectures
# (``models/lightconv.py:lightconv_wmt_en_de`` etc.)
ARCH_KERNELS: Dict[str, Tuple[Sequence[int], Sequence[int]]] = {
    "lightconv_wmt_en_de": ([3, 7, 15, 31, 31, 31, 31], [3, 7, 15, 31, 31, 31]),
    "dynamicconv_wmt_en_de": ([3, 7, 15, 31, 31, 31, 31], [3, 7, 15, 31, 31, 31]),
    "lightconv_iwslt_de_en": ([3, 7, 15, 31, 31, 31, 31], [3, 7, 15, 31, 31, 31]),
    "dynamicconv_iwslt_de_en": ([3, 7, 15, 31, 31, 31, 31], [3, 7, 15, 31, 31, 31]),
}


class LightConvModel(nn.Module):
    """Seq2seq LightConv/DynamicConv transformer (``models/lightconv.py``):
    conv blocks replace self-attention; the decoder keeps softmax
    cross-attention over the encoder output."""

    src_vocab_size: int
    tgt_vocab_size: int
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_heads: int = 8
    conv_type: str = "lightweight"
    encoder_kernels: Sequence[int] = (3, 7, 15, 31, 31, 31, 31)
    decoder_kernels: Sequence[int] = (3, 7, 15, 31, 31, 31)
    dropout: float = 0.1
    weight_dropout: float = 0.1
    max_len: int = 1024
    pad_idx: int = 1

    def setup(self):
        from efficient_attention_tpu.models.transformer import (
            CrossAttention,
            sinusoidal_positions,
        )

        self.src_embed = nn.Embed(self.src_vocab_size, self.embed_dim,
                                  embedding_init=trunc_normal_init)
        self.tgt_embed = nn.Embed(self.tgt_vocab_size, self.embed_dim,
                                  embedding_init=trunc_normal_init)
        self.pos = sinusoidal_positions(self.max_len, self.embed_dim)
        self.enc_layers = [
            LightConvLayer(
                embed_dim=self.embed_dim, conv_dim=self.embed_dim,
                ffn_dim=self.ffn_dim, kernel_size=k,
                num_heads=self.num_heads, conv_type=self.conv_type,
                causal=False, dropout=self.dropout,
                weight_dropout=self.weight_dropout,
                name=f"enc_{i}")
            for i, k in enumerate(self.encoder_kernels)]
        self.dec_conv_layers = [
            LightConvLayer(
                embed_dim=self.embed_dim, conv_dim=self.embed_dim,
                ffn_dim=self.ffn_dim, kernel_size=k,
                num_heads=self.num_heads, conv_type=self.conv_type,
                causal=True, dropout=self.dropout,
                weight_dropout=self.weight_dropout,
                name=f"dec_{i}")
            for i, k in enumerate(self.decoder_kernels)]
        self.cross_layers = [
            CrossAttention(embed_dim=self.embed_dim,
                           num_heads=self.num_heads, dropout=self.dropout,
                           name=f"cross_{i}")
            for i in range(len(self.decoder_kernels))]
        self.cross_lns = [nn.LayerNorm(name=f"cross_ln_{i}")
                          for i in range(len(self.decoder_kernels))]
        self.out_proj = nn.Dense(self.tgt_vocab_size, use_bias=False,
                                 name="output_projection")
        self.drop = nn.Dropout(self.dropout)

    def encode(self, src_tokens: Array, deterministic: bool = True):
        pad = src_tokens == self.pad_idx
        h = self.src_embed(src_tokens) * self.embed_dim ** 0.5
        h = h + self.pos[: h.shape[1]][None]
        h = self.drop(h, deterministic=deterministic)
        h = jnp.where(pad[..., None], 0.0, h)
        for layer in self.enc_layers:
            h = layer(h, deterministic=deterministic)
            h = jnp.where(pad[..., None], 0.0, h)
        return h, pad

    def __call__(self, src_tokens: Array, prev_output_tokens: Array,
                 deterministic: bool = True) -> Array:
        enc_out, enc_pad = self.encode(src_tokens, deterministic)
        h = self.tgt_embed(prev_output_tokens) * self.embed_dim ** 0.5
        h = h + self.pos[: h.shape[1]][None]
        h = self.drop(h, deterministic=deterministic)
        for conv, cross, ln in zip(self.dec_conv_layers, self.cross_layers,
                                   self.cross_lns):
            h = conv(h, deterministic=deterministic)
            h = ln(h + cross(h, enc_out, enc_pad,
                             deterministic=deterministic))
        return self.out_proj(h)


def _make_arch(name: str, conv_type: str):
    from efficient_attention_tpu.models.registry import register_model

    enc_k, dec_k = ARCH_KERNELS[name]

    def builder(src_vocab_size, tgt_vocab_size, **kw):
        return LightConvModel(
            src_vocab_size=src_vocab_size, tgt_vocab_size=tgt_vocab_size,
            conv_type=conv_type, encoder_kernels=enc_k, decoder_kernels=dec_k,
            **kw)

    builder.__name__ = name
    return register_model(builder)


for _name, _ctype in (("lightconv_wmt_en_de", "lightweight"),
                      ("dynamicconv_wmt_en_de", "dynamic"),
                      ("lightconv_iwslt_de_en", "lightweight"),
                      ("dynamicconv_iwslt_de_en", "dynamic")):
    _make_arch(_name, _ctype)
