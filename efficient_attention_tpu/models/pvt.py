"""PVTv2: 4-stage pyramid vision transformer.

TPU-native rebuild of ``vit/models/pvt_legacy.py``.  Stage ``i`` uses the
factory attention when ``sr_ratio > 1`` (the long-sequence stages 3136/784/196
tokens) and exact softmax for the final 49-token stage
(``pvt_legacy.py:78-87``).  Tokens stay in NHWC grids between stages.
Registered archs mirror ``pvt_legacy.py:322-471``:
``pvt_{nano,tiny,small,medium,base,large}`` plus head-doubled ``*2`` variants.
"""
from __future__ import annotations

from dataclasses import field
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficient_attention_tpu import AttentionFactory
from efficient_attention_tpu.models.layers import (
    DropPath,
    MlpWithDepthwiseConv,
    OverlapPatchEmbed,
    trunc_normal_init,
)
from efficient_attention_tpu.models.registry import register_model

Array = jax.Array


class PVTBlock(nn.Module):
    """PVT block: attention over [B, H, W, C] grids + DW-conv MLP
    (``pvt_legacy.py:95-132``)."""

    attn_name: str
    attn_args: Dict[str, Any]
    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    linear: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        base_args = {
            "dim": self.dim,
            "num_heads": self.num_heads,
            "qkv_bias": self.qkv_bias,
            "attn_drop": self.attn_drop,
            "proj_drop": self.drop,
        }
        if self.sr_ratio > 1:
            attn_args = {**self.attn_args, **base_args}
            if "kernel_size" in attn_args and attn_args["kernel_size"] is not None:
                attn_args["kernel_size"] = self.sr_ratio
            attn = AttentionFactory.build_attention(self.attn_name, attn_args)
        else:
            attn = AttentionFactory.build_attention("softmax", base_args)
        h = attn(nn.LayerNorm(epsilon=1e-6)(x), deterministic=deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic=deterministic)
        h = MlpWithDepthwiseConv(
            hidden_features=int(self.dim * self.mlp_ratio),
            drop=self.drop,
            linear=self.linear,
        )(nn.LayerNorm(epsilon=1e-6)(x), deterministic=deterministic)
        return x + DropPath(self.drop_path)(h, deterministic=deterministic)


class PyramidVisionTransformerV2(nn.Module):
    """4-stage PVTv2 (``pvt_legacy.py:192-282``)."""

    attn_name: str = "softmax"
    attn_args: Dict[str, Any] = field(default_factory=dict)
    img_size: int = 224
    in_chans: int = 3
    num_classes: int = 1000
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    depths: Sequence[int] = (2, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    linear: bool = False
    use_conv_patchify: bool = False
    # ``--checkpoint-activations``: nn.remat each block in training (see
    # ``efficient_vit.EfficientTransformer.checkpoint_activations``)
    checkpoint_activations: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        import numpy as np

        total_depth = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total_depth)]
        cur = 0
        for i in range(4):
            x, _ = OverlapPatchEmbed(
                patch_size=7 if i == 0 else 3,
                stride=4 if i == 0 else 2,
                embed_dim=self.embed_dims[i],
                use_conv_patchify=(self.use_conv_patchify and i == 0),
                name=f"patch_embed{i + 1}",
            )(x)
            for j in range(self.depths[i]):
                blk = PVTBlock(
                    attn_name=self.attn_name,
                    attn_args=dict(self.attn_args),
                    dim=self.embed_dims[i],
                    num_heads=self.num_heads[i],
                    mlp_ratio=self.mlp_ratios[i],
                    sr_ratio=self.sr_ratios[i],
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path=dpr[cur + j],
                    linear=self.linear,
                    name=f"block{i + 1}_{j}",
                )
                if self.checkpoint_activations and not deterministic:
                    def apply(mdl, h):
                        return mdl(h, deterministic=False)

                    x = nn.remat(apply)(blk, x)
                else:
                    x = blk(x, deterministic=deterministic)
            cur += self.depths[i]
            x = nn.LayerNorm(epsilon=1e-6, name=f"norm{i + 1}")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                         bias_init=nn.initializers.zeros, name="head")(x)
        return x

    @staticmethod
    def add_model_specific_args(parent_parser):
        parser = parent_parser.add_argument_group("PVT")
        parser.add_argument("--use-conv-patchify", action="store_true",
                            default=False)
        return parent_parser


def _pvt(depths, num_heads=(1, 2, 5, 8), embed_dims=(64, 128, 320, 512),
         mlp_ratios=(8, 8, 4, 4), **kw):
    kw.setdefault("drop_path_rate", 0.1)
    kw.pop("num_heads_override", None)
    return PyramidVisionTransformerV2(
        depths=depths, num_heads=num_heads, embed_dims=embed_dims,
        mlp_ratios=mlp_ratios, **kw)


@register_model
def pvt_nano(**kw):
    return _pvt((2, 2, 2, 2), embed_dims=(32, 64, 160, 256), **kw)


@register_model
def pvt_tiny(**kw):
    return _pvt((2, 2, 2, 2), **kw)


@register_model
def pvt_small(**kw):
    return _pvt((3, 4, 6, 3), **kw)


@register_model
def pvt_medium(**kw):
    return _pvt((3, 4, 18, 3), **kw)


@register_model
def pvt_base(**kw):
    return _pvt((3, 8, 27, 3), **kw)


@register_model
def pvt_large(**kw):
    return _pvt((3, 6, 40, 3), mlp_ratios=(4, 4, 4, 4), **kw)


@register_model
def pvt_tiny2(**kw):
    return _pvt((2, 2, 2, 2), num_heads=(2, 4, 10, 16), **kw)


@register_model
def pvt_small2(**kw):
    return _pvt((3, 4, 6, 3), num_heads=(2, 4, 10, 16), **kw)


@register_model
def pvt_medium2(**kw):
    return _pvt((3, 4, 18, 3), num_heads=(2, 4, 10, 16), **kw)


@register_model
def pvt_base2(**kw):
    return _pvt((3, 8, 27, 3), num_heads=(2, 4, 10, 16), **kw)


@register_model
def pvt_large2(**kw):
    return _pvt((3, 6, 40, 3), num_heads=(2, 4, 10, 16),
                mlp_ratios=(4, 4, 4, 4), **kw)
