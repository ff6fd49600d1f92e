"""DeiT-style EfficientTransformer keeping tokens as a [B, H, W, C] grid.

TPU-native rebuild of ``vit/models/efficient_vit.py``: pre-LN blocks with
factory-built attention + GatedMlp + stochastic depth, learned 2-D positional
embedding, no CLS token (mean-pool head, ``efficient_vit.py:230-233``).
Registered architectures mirror ``efficient_vit.py:260-366``:
``evit_{tiny,small,base}_p{16,8}`` and ``evit_{tiny,small}_p4``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficient_attention_tpu import AttentionFactory
from efficient_attention_tpu.models.layers import (
    DropPath,
    GatedMlp,
    PatchEmbed,
    trunc_normal_init,
)
from efficient_attention_tpu.models.registry import register_model

Array = jax.Array


class Block(nn.Module):
    """Pre-LN transformer block (``efficient_vit.py:97-121``)."""

    attn_name: str
    attn_args: Dict[str, Any]
    dim: int
    mlp_ratio: float
    drop_path: float
    drop_rate: float = 0.0
    use_glu: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        attn = AttentionFactory.build_attention(self.attn_name, self.attn_args)
        h = attn(nn.LayerNorm(epsilon=1e-6)(x), deterministic=deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic=deterministic)
        h = GatedMlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            drop=self.drop_rate,
            use_glu=self.use_glu,
        )(nn.LayerNorm(epsilon=1e-6)(x), deterministic=deterministic)
        return x + DropPath(self.drop_path)(h, deterministic=deterministic)


class EfficientTransformer(nn.Module):
    """Grid-token ViT (``efficient_vit.py:123-249``)."""

    attn_name: str = "softmax"
    attn_args: Dict[str, Any] = field(default_factory=dict)
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    patchify_stem: str = "default"
    use_glu: bool = False
    use_pos_emb: bool = True
    # ``--checkpoint-activations``: rematerialize each block in the
    # backward (``nn.remat``) instead of storing its activations — the
    # TPU-native form of fairseq's ``checkpoint_wrapper`` applied to the
    # vision stack (the reference vit has no flag for it; the fairseq
    # substrate does, ``transformer_config.py:165``)
    checkpoint_activations: bool = False

    def setup(self):
        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            stem_type=self.patchify_stem,
        )
        grid = self.img_size // self.patch_size
        if self.use_pos_emb:
            self.pos_embed = self.param(
                "pos_embed", trunc_normal_init,
                (1, grid, grid, self.embed_dim))
            self.pos_drop = nn.Dropout(self.drop_rate)
        merged_attn_args = {
            **self.attn_args,
            "dim": self.embed_dim,
            "num_heads": self.num_heads,
            "qkv_bias": self.qkv_bias,
            "attn_drop": self.attn_drop_rate,
            "proj_drop": self.drop_rate,
        }
        import numpy as np

        dpr = [float(x) for x in np.linspace(0, self.drop_path_rate, self.depth)]
        self.blocks = [
            Block(
                attn_name=self.attn_name,
                attn_args=merged_attn_args,
                dim=self.embed_dim,
                mlp_ratio=self.mlp_ratio,
                drop_path=dpr[i],
                drop_rate=self.drop_rate,
                use_glu=self.use_glu,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm_before_pooling = nn.LayerNorm(epsilon=1e-6)
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                                 bias_init=nn.initializers.zeros)

    def forward_features(self, x: Array, deterministic: bool = True) -> Array:
        x = self.patch_embed(x)  # [B, H, W, C]
        if self.use_pos_emb:
            x = x + self.pos_embed
            x = self.pos_drop(x, deterministic=deterministic)
        B, H, W, C = x.shape
        if self.checkpoint_activations and not deterministic:
            def apply(mdl, h):
                return mdl(h, deterministic=False)

            apply = nn.remat(apply)
            for blk in self.blocks:
                x = apply(blk, x)
        else:
            for blk in self.blocks:
                x = blk(x, deterministic=deterministic)
        x = self.norm_before_pooling(x.reshape(B, H * W, C))
        return jnp.mean(x, axis=1)

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = self.forward_features(x, deterministic=deterministic)
        if self.num_classes > 0:
            x = self.head(x)
        return x

    @staticmethod
    def add_model_specific_args(parent_parser):
        parser = parent_parser.add_argument_group("Deit")
        parser.add_argument("--patchify-stem", default="default", type=str)
        parser.add_argument("--num-heads", default=None, type=int)
        parser.add_argument("--use-glu", action="store_true", default=False)
        parser.add_argument("--patch-size", default=16, type=int)
        parser.add_argument("--depth", default=12, type=int,
                            help="number of transformer layers")
        return parent_parser


def _evit(embed_dim: int, num_heads: int, patch_size: int, **kwargs):
    kwargs.setdefault("num_heads", num_heads)
    if kwargs["num_heads"] is None:
        kwargs["num_heads"] = num_heads
    return EfficientTransformer(
        embed_dim=embed_dim, patch_size=patch_size, **kwargs)


@register_model
def evit_tiny_p16(**kw):
    return _evit(192, 3, 16, **kw)


@register_model
def evit_small_p16(**kw):
    return _evit(384, 6, 16, **kw)


@register_model
def evit_base_p16(**kw):
    return _evit(768, 12, 16, **kw)


@register_model
def evit_tiny_p8(**kw):
    return _evit(192, 3, 8, **kw)


@register_model
def evit_small_p8(**kw):
    return _evit(384, 6, 8, **kw)


@register_model
def evit_base_p8(**kw):
    return _evit(768, 12, 8, **kw)


@register_model
def evit_tiny_p4(**kw):
    return _evit(192, 3, 4, **kw)


@register_model
def evit_small_p4(**kw):
    return _evit(384, 6, 4, **kw)
