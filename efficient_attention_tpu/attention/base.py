"""Exact softmax multi-head attention — the numerical baseline of the zoo.

TPU-native re-design of ``efficient-attention/efficient_attention/
abstract_attention.py:41-140`` as a flax.linen module.  Train/eval mode
becomes an explicit ``deterministic`` flag; stochastic draws use named RNG
streams (``dropout``, ``sample``) instead of PyTorch's implicit global RNG.

Call convention (matching ``abstract_attention.py:80-89``):
``__call__(x, key_padding_mask=None, deterministic=True)`` with
``x: [B, N, C]`` or ``[B, H, W, C]`` and ``key_padding_mask: [B, N]`` bool,
True = padding.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# fp16/bf16-safe large-negative fill, matching the reference convention
# (``local_attention.py:141``, ``eva.py:139``, ``causal_eva.py:488``).
def on_tpu() -> bool:
    """True when the default device is a TPU (incl. tunneled 'axon' TPUs)."""
    try:
        dev = jax.devices()[0]
        return dev.platform in ("tpu", "axon") or "TPU" in str(dev)
    except Exception:
        return False


MASK_VAL = -5e4

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class MultiheadAttention(nn.Module):
    """Exact softmax attention with fused QKV projection
    (``abstract_attention.py:41-133``)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    fp32: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def scale(self) -> float:
        return self.head_dim ** -0.5

    def setup(self):
        self._setup_projections()

    def _setup_projections(self):
        self.qkv = nn.Dense(
            self.dim * 3,
            use_bias=self.qkv_bias,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            name="qkv",
        )
        self.proj = nn.Dense(
            self.dim,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            name="proj",
        )
        self.attn_dropout = nn.Dropout(self.attn_drop)
        self.proj_dropout = nn.Dropout(self.proj_drop)

    def proj_and_split_heads(self, x: Array) -> Tuple[Array, Array, Array]:
        """``[B, *seq, C] -> 3 x [B, H, N, Dh]`` (``abstract_attention.py:72-78``)."""
        B = x.shape[0]
        C = x.shape[-1]
        seq_shape = x.shape[1:-1]
        N = math.prod(seq_shape)
        qkv = self.qkv(x.reshape(B, N, C))
        qkv = qkv.reshape(B, N, 3, self.num_heads, self.head_dim)
        qkv = jnp.moveaxis(qkv, 2, 0)  # [3, B, N, H, Dh]
        qkv = jnp.swapaxes(qkv, 2, 3)  # [3, B, H, N, Dh]
        return qkv[0], qkv[1], qkv[2]

    def __call__(
        self,
        x: Array,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        B = x.shape[0]
        C = x.shape[-1]
        seq_shape = x.shape[1:-1]
        q, k, v = self.proj_and_split_heads(x)
        output = self._apply_attention(q, k, v, key_padding_mask, deterministic)
        x = jnp.swapaxes(output, 1, 2).reshape((B,) + tuple(seq_shape) + (C,))
        x = self.proj(x)
        return self.proj_dropout(x, deterministic=deterministic)

    def _apply_attention(
        self,
        q: Array,
        k: Array,
        v: Array,
        key_padding_mask: Optional[Array],
        deterministic: bool,
    ) -> Array:
        """Scaled dot-product attention (``abstract_attention.py:91-133``)."""
        dtype = jnp.float32 if self.fp32 else q.dtype
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ).astype(dtype) * self.scale
        if key_padding_mask is not None:
            attn = jnp.where(
                key_padding_mask[:, None, None, :].astype(bool), MASK_VAL, attn
            )
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        return jnp.einsum("bhnm,bhmd->bhnd", attn, v)

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parser = parent_parser.add_argument_group("Attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(
            parser, f"--{p}fp32", struct_name=struct_name, prefix=prefix,
            default=False, action="store_true",
        )
        return parent_parser
