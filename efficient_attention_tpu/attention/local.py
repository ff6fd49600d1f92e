"""Blocked local (window) attention, 1-D and 2-D, with optional halos + RPE.

TPU-native rebuild of ``efficient-attention/efficient_attention/
local_attention.py``.  The CUDA ``as_strided`` halo trick becomes a static
gather (see :mod:`efficient_attention_tpu.ops.windows`); everything else is
window-batched einsums that XLA tiles onto the MXU.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efficient_attention_tpu.attention.base import (
    MASK_VAL,
    MultiheadAttention,
    trunc_normal_init,
)
from efficient_attention_tpu.ops import windows as W
from efficient_attention_tpu.ops.rpe import local_2d_rpe_index

Array = jax.Array


class LocalAttention(MultiheadAttention):
    """Window attention with optional overlapping halo and learned RPE
    (``local_attention.py:25-182``)."""

    use_rpe: bool = False
    window_size: int = 2
    attn_2d: bool = False
    overlap_window: bool = False

    @property
    def ext_size(self) -> int:
        # ``local_attention.py:38-41``
        return max(1, self.window_size // 2) if self.overlap_window else 0

    @property
    def rpe_enabled(self) -> bool:
        return self.use_rpe and self.window_size > 0

    def setup(self):
        self._setup_projections()
        self._setup_rpe()

    def _setup_rpe(self):
        if not self.rpe_enabled:
            return
        w, e = self.window_size, self.ext_size
        if self.attn_2d:
            index, table_size = local_2d_rpe_index(w, e)
            self._rpe_index = jnp.asarray(index.reshape(-1))
            self.local_relative_position_bias_table = self.param(
                "local_relative_position_bias_table",
                trunc_normal_init,
                (table_size, self.num_heads),
            )
        else:
            self.local_relative_position_bias_table = self.param(
                "local_relative_position_bias_table",
                trunc_normal_init,
                (self.num_heads, w, w + 2 * e),
            )

    def add_rel_pos_bias(self, local_dots: Array) -> Array:
        """Add the learned relative-position bias (``local_attention.py:70-79``)."""
        if self.attn_2d:
            w, e = self.window_size, self.ext_size
            bias = jnp.take(
                self.local_relative_position_bias_table, self._rpe_index, axis=0
            ).reshape(1, w * w, (2 * e + w) ** 2, self.num_heads)
            bias = jnp.transpose(bias, (0, 3, 1, 2))[:, :, None]  # [1, h, 1, i, j]
        else:
            bias = self.local_relative_position_bias_table[None, :, None]
        return local_dots + bias

    def window_partition(
        self,
        x: Array,
        shape: Union[int, Sequence[int]],
        ext_window_size: int,
        pad_val: float = 0.0,
        window_size: Optional[int] = None,
    ) -> Array:
        """Dispatch 1-D/2-D partition (``local_attention.py:81-107``)."""
        window_size = self.window_size if window_size is None else window_size
        if self.attn_2d:
            H, W_ = shape
            *lead, n, d = x.shape
            x2 = x.reshape(*lead, H, W_, d)
            return W.window_2d_partition(x2, window_size, ext_window_size, pad_val)
        return W.window_1d_partition(x, window_size, ext_window_size, pad_val)

    def window_merge(
        self, x: Array, shape: Union[int, Sequence[int]], window_size: Optional[int] = None
    ) -> Array:
        window_size = self.window_size if window_size is None else window_size
        if self.attn_2d:
            out = W.window_2d_merge(x, window_size, tuple(shape))
            *lead, H, W_, d = out.shape
            return out.reshape(*lead, H * W_, d)
        return W.window_1d_merge(x)

    def _process_input(self, x: Array, key_padding_mask: Optional[Array]):
        """Pad sequence (and mask) to a window multiple (``local_attention.py:109-131``)."""
        B = x.shape[0]
        seq_shape = x.shape[1:-1]
        C = x.shape[-1]
        N = math.prod(seq_shape)
        if self.attn_2d:
            assert len(seq_shape) == 2
            if self.window_size > 0:
                assert seq_shape[0] % self.window_size == 0
                assert seq_shape[1] % self.window_size == 0
            x = x.reshape(B, N, C)
        elif self.window_size > 0:
            orig_n = N
            x = W.pad_to_multiple(x, self.window_size, axis=-2)
            N = x.shape[-2]
            if key_padding_mask is None:
                key_padding_mask = W.padding_mask_for(B, orig_n, N)
            else:
                key_padding_mask = W.pad_to_multiple(
                    key_padding_mask, self.window_size, axis=-1, value=True
                )
            seq_shape = (N,)
        return x, key_padding_mask, seq_shape

    def __call__(
        self,
        x: Array,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """Adds a packed zero-transpose Pallas fast path for 2-D square
        windows (no halo, no padding mask, attn_drop=0, on TPU); otherwise
        the base windowed-einsum path (``local_attention.py:134-182``)."""
        from efficient_attention_tpu.attention.base import on_tpu

        if (self.attn_2d and key_padding_mask is None
                and self.ext_size == 0 and self.attn_drop == 0.0
                and len(x.shape) == 4 and on_tpu()):
            from efficient_attention_tpu.ops.pallas.local_packed import (
                local_attention_packed,
                supports_packed,
            )

            B, gh, gw, C = x.shape
            N = gh * gw
            ws = self.window_size
            if (ws > 0 and gh % ws == 0 and gw % ws == 0
                    and supports_packed(B, N, gw, ws)):
                qkv = self.qkv(x.reshape(B, N, C))
                bias = None
                if self.rpe_enabled:
                    bias = jnp.transpose(
                        jnp.take(self.local_relative_position_bias_table,
                                 self._rpe_index, axis=0)
                        .reshape(ws * ws, ws * ws, self.num_heads),
                        (2, 0, 1))
                out = local_attention_packed(
                    qkv, self.scale, self.num_heads, gw, ws, bias=bias)
                x = self.proj(out.reshape(B, gh, gw, C))
                return self.proj_dropout(x, deterministic=deterministic)
        return super().__call__(x, key_padding_mask, deterministic)

    def _apply_attention(
        self,
        q: Array,
        k: Array,
        v: Array,
        key_padding_mask: Optional[Array],
        deterministic: bool,
    ) -> Array:
        """Windowed attention core (``local_attention.py:134-182``)."""
        if self.attn_2d:
            b, h, n, d = q.shape
            H = W_ = int(math.sqrt(n))
            assert H * W_ == n
            shape: Union[int, Tuple[int, int]] = (H, W_)
            orig_n = n
        else:
            orig_n = q.shape[-2]
            q = W.pad_to_multiple(q, self.window_size, axis=-2)
            k = W.pad_to_multiple(k, self.window_size, axis=-2)
            v = W.pad_to_multiple(v, self.window_size, axis=-2)
            b, h, n, d = q.shape
            if key_padding_mask is None:
                key_padding_mask = W.padding_mask_for(b, orig_n, n)
            else:
                key_padding_mask = W.pad_to_multiple(
                    key_padding_mask, self.window_size, axis=-1, value=True
                )
            shape = n
        if key_padding_mask is None:
            key_padding_mask = jnp.zeros((b, n), dtype=bool)
        # [b, 1, n, 1]
        kpm = key_padding_mask.astype(q.dtype)[:, None, :, None]

        w_q = self.window_partition(q, shape, ext_window_size=0)
        w_k = self.window_partition(k, shape, ext_window_size=self.ext_size)
        w_v = self.window_partition(v, shape, ext_window_size=self.ext_size)
        local_dots = (
            jnp.einsum("bhwie,bhwje->bhwij", w_q, w_k, preferred_element_type=jnp.float32)
            * self.scale
        ).astype(q.dtype)

        if self.rpe_enabled:
            local_dots = self.add_rel_pos_bias(local_dots)

        mask = self.window_partition(
            kpm, shape, ext_window_size=self.ext_size, pad_val=1.0
        ).astype(bool)
        mask = jnp.swapaxes(mask, -1, -2)  # [b, 1, w, 1, j]
        local_dots = jnp.where(mask, MASK_VAL, local_dots)

        local_attn = jax.nn.softmax(local_dots, axis=-1)
        local_attn = self.attn_dropout(local_attn, deterministic=deterministic)
        output = jnp.einsum("bhwij,bhwje->bhwie", local_attn, w_v)
        output = self.window_merge(output, shape)[..., :orig_n, :]
        return output

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parent_parser = MultiheadAttention.add_attn_specific_args(
            parent_parser, struct_name=struct_name, prefix=prefix
        )
        parser = parent_parser.add_argument_group("Attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(parser, f"--{p}use-rpe", action="store_true",
                            struct_name=struct_name, prefix=prefix, default=False)
        add_nested_argument(parser, f"--{p}window-size", struct_name=struct_name,
                            prefix=prefix, default=4, type=int)
        add_nested_argument(parser, f"--{p}attn-2d", action="store_true",
                            struct_name=struct_name, prefix=prefix, default=False)
        add_nested_argument(parser, f"--{p}overlap-window", action="store_true",
                            struct_name=struct_name, prefix=prefix, default=False)
        return parent_parser
