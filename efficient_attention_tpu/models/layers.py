"""Shared model layers: gated MLP, stochastic depth, patch embeddings.

TPU-native rebuilds of ``vit/models/model_utils.py`` (GatedMlp) and the patch
embedding stems in ``vit/models/efficient_vit.py:32-95`` /
``vit/models/pvt_legacy.py:135-189``.  Convolutions use NHWC layout (the TPU
conv layout) throughout.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch-style Conv2d init used by the reference ``_init_weights``
    (``efficient_vit.py`` via ``MultiheadAttention._init_weights``):
    normal(0, sqrt(2 / fan_out))."""
    kh, kw, _, out_ch = shape
    fan_out = kh * kw * out_ch
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)


class DropPath(nn.Module):
    """Stochastic depth (timm ``DropPath`` used at ``efficient_vit.py:111``)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class GatedMlp(nn.Module):
    """MLP with optional GLU gating (``vit/models/model_utils.py:11-45``)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = nn.gelu
    drop: float = 0.0
    use_glu: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out_features = self.out_features or x.shape[-1]
        hidden = self.hidden_features
        if self.use_glu:
            # 2/3 hidden scaling as in the reference (``model_utils.py:20-24``)
            hidden = int(2 * hidden / 3)
            x12 = nn.Dense(hidden * 2, kernel_init=trunc_normal_init,
                           bias_init=nn.initializers.zeros)(x)
            x1, x2 = jnp.split(x12, 2, axis=-1)
            x = self.act(x1) * x2
        else:
            x = nn.Dense(hidden, kernel_init=trunc_normal_init,
                         bias_init=nn.initializers.zeros)(x)
            x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out_features, kernel_init=trunc_normal_init,
                     bias_init=nn.initializers.zeros)(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class MlpWithDepthwiseConv(nn.Module):
    """PVTv2 MLP with a 3x3 depthwise conv between the two projections
    (``pvt_legacy.py`` ``Mlp:20-60`` + ``DWConv:285-296``).  Operates on
    ``[B, H, W, C]`` grids (NHWC is TPU-native)."""

    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    linear: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, kernel_init=trunc_normal_init,
                     bias_init=nn.initializers.zeros)(x)
        if self.linear:
            x = jax.nn.relu(x)
        x = nn.Conv(self.hidden_features, (3, 3), padding=1,
                    feature_group_count=self.hidden_features,
                    kernel_init=conv_kernel_init)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out_features, kernel_init=trunc_normal_init,
                     bias_init=nn.initializers.zeros)(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class PatchEmbed(nn.Module):
    """Image-to-grid patch embedding with selectable stems
    (``efficient_vit.py:32-95``): ``default`` single conv, ``conv`` 3-conv
    stack, ``hmlp`` hierarchical-MLP stem."""

    patch_size: int = 16
    embed_dim: int = 768
    stem_type: str = "default"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p, d = self.patch_size, self.embed_dim
        if self.stem_type == "default":
            x = nn.Conv(d, (p, p), strides=(p, p), padding="VALID",
                        kernel_init=conv_kernel_init)(x)
        elif self.stem_type == "conv":
            # three stride-2 3x3 convs (-> /8) + patch-size-dependent tail
            # (``efficient_vit.py:58-75``); GroupNorm(1) == channel LayerNorm
            assert p in (8, 16), "conv stem supports patch sizes 8 and 16"
            for ch in (d // 4, d // 4, d):
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            kernel_init=conv_kernel_init)(x)
                # GroupNorm(1) == LayerNorm over (H, W, C), per reference
                x = nn.GroupNorm(num_groups=1)(x)
                x = jax.nn.relu(x)
            if p == 16:
                x = nn.Conv(d, (2, 2), strides=(2, 2), padding="VALID",
                            kernel_init=conv_kernel_init)(x)
            else:
                x = nn.Conv(d, (1, 1), strides=(1, 1), padding="VALID",
                            kernel_init=conv_kernel_init)(x)
        elif self.stem_type == "hmlp":
            # hierarchical-MLP stem (``efficient_vit.py:42-57``)
            assert p in (8, 16), "hmlp stem supports patch sizes 8 and 16"
            s0 = 4 if p == 16 else 2
            x = nn.Conv(d // 4, (s0, s0), strides=(s0, s0), padding="VALID",
                        kernel_init=conv_kernel_init)(x)
            x = nn.GroupNorm(num_groups=1)(x)
            x = nn.gelu(x)
            x = nn.Conv(d // 4, (2, 2), strides=(2, 2), padding="VALID",
                        kernel_init=conv_kernel_init)(x)
            x = nn.GroupNorm(num_groups=1)(x)
            x = nn.gelu(x)
            x = nn.Conv(d, (2, 2), strides=(2, 2), padding="VALID",
                        kernel_init=conv_kernel_init)(x)
            x = nn.GroupNorm(num_groups=1)(x)
        else:
            raise NotImplementedError(f"stem {self.stem_type}")
        return x  # [B, H/p, W/p, d]


class OverlapPatchEmbed(nn.Module):
    """PVTv2 overlapping patch embedding (``pvt_legacy.py:135-189``).

    With ``use_conv_patchify`` the first stage uses a 3-conv stem
    (``pvt_legacy.py:152-163``); the reference normalizes with SyncBatchNorm,
    replaced here by GroupNorm(1) — batch-independent, no mutable state, and
    equivalent at inference.
    """

    patch_size: int = 7
    stride: int = 4
    embed_dim: int = 768
    use_conv_patchify: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Tuple[int, int]]:
        if self.use_conv_patchify:
            d = self.embed_dim
            x = nn.Conv(d // 4, (3, 3), strides=(2, 2), padding=1,
                        kernel_init=conv_kernel_init)(x)
            x = nn.GroupNorm(num_groups=1)(x)
            x = nn.gelu(x)
            x = nn.Conv(d // 2, (3, 3), strides=(2, 2), padding=1,
                        kernel_init=conv_kernel_init)(x)
            x = nn.GroupNorm(num_groups=1)(x)
            x = nn.gelu(x)
            x = nn.Conv(d, (3, 3), strides=(1, 1), padding=1,
                        kernel_init=conv_kernel_init)(x)
            x = nn.GroupNorm(num_groups=1)(x)
        else:
            pad = self.patch_size // 2
            x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                        strides=(self.stride, self.stride), padding=pad,
                        kernel_init=conv_kernel_init)(x)
        H, W = x.shape[1], x.shape[2]
        x = nn.LayerNorm()(x)
        return x, (H, W)
