"""ScatterBrain: unified sparse (local) + low-rank (Performer) attention.

TPU-native rebuild of ``efficient-attention/efficient_attention/
scatterbrain_attention.py`` (NeurIPS 2021 re-implementation).  The non-local
kv statistics are the global Performer statistics minus the in-window
contribution, combined with exact local logits under one softmax in log
space.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from efficient_attention_tpu.attention.base import MASK_VAL
from efficient_attention_tpu.attention.kernelized import KernelizedAttention
from efficient_attention_tpu.attention.local import LocalAttention
from efficient_attention_tpu.ops.log_ops import log_add_exp
from efficient_attention_tpu.ops.random_features import log_favorp_projection

Array = jax.Array


class ScatterBrain(KernelizedAttention, LocalAttention):
    """Sparse + low-rank attention (``scatterbrain_attention.py:50-180``).

    Diamond inheritance mirrors the reference: feature-map machinery from
    :class:`KernelizedAttention`, window machinery from :class:`LocalAttention`.
    """

    def setup(self):
        KernelizedAttention.setup(self)
        self._setup_rpe()

    def q_k_projection(self, q: Array, k: Array, random_proj: Optional[Array]):
        """favorp runs in log space here (``scatterbrain_attention.py:60-70``)."""
        if self.proj_method == "favorp":
            assert random_proj is not None
            fp = partial(log_favorp_projection, projection=random_proj)
            return fp(q, is_query=True), fp(k, is_query=False)
        return KernelizedAttention.q_k_projection(self, q, k, random_proj)

    def __call__(
        self,
        x: Array,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """ScatterBrain forward (``scatterbrain_attention.py:72-168``)."""
        B = x.shape[0]
        C = x.shape[-1]
        orig_n = math.prod(x.shape[1:-1])
        x, key_padding_mask, seq_shape = self._process_input(x, key_padding_mask)
        N = math.prod(seq_shape)
        x = x.reshape(B, N, C)
        q, k, v = self.proj_and_split_heads(x)

        if key_padding_mask is None:
            key_padding_mask = jnp.zeros((B, N), dtype=bool)
        kpm = key_padding_mask.astype(q.dtype)[:, None, :, None]  # [b, 1, n, 1]
        kpm_bool = kpm.astype(bool)

        # ---- low-rank (Performer) branch, log space ----
        projection_matrix = self.get_proj_matrix(deterministic, q.dtype)
        assert self.proj_method == "favorp", (
            "ScatterBrain requires log-space favorp features"
        )
        log_proj_q, log_proj_k = self.q_k_projection(q, k, projection_matrix)
        log_proj_k = jnp.where(kpm_bool, -jnp.inf, log_proj_k)

        w_q = self.window_partition(q, seq_shape, ext_window_size=0)
        w_k = self.window_partition(k, seq_shape, ext_window_size=self.ext_size)
        w_v = self.window_partition(v, seq_shape, ext_window_size=self.ext_size)

        # ---- non-local kv statistics: global minus in-window ----
        w_log_proj_q = self.window_partition(log_proj_q, seq_shape, ext_window_size=0)
        w_log_proj_k = self.window_partition(
            log_proj_k, seq_shape, ext_window_size=self.ext_size, pad_val=-jnp.inf
        )
        log_proj_k_g = log_proj_k[:, :, None]  # [b, h, 1, lk, c]
        max_proj_k = jax.lax.stop_gradient(
            jnp.maximum(
                jnp.max(log_proj_k_g, axis=-2, keepdims=True),
                jnp.max(w_log_proj_k, axis=(-2, -3), keepdims=True),
            )
        )
        proj_k = jnp.exp(log_proj_k_g - max_proj_k)  # [b, h, 1, lk, c]
        w_proj_k = jnp.exp(w_log_proj_k - max_proj_k)  # [b, h, g, w, c]
        kv_stats = (
            jnp.einsum("bhtmc,bhmd->bhtcd", proj_k, v)
            - jnp.einsum("bhgwc,bhgwd->bhgcd", w_proj_k, w_v)
        ) / jnp.clip(
            (jnp.sum(proj_k, axis=-2) - jnp.sum(w_proj_k, axis=-2))[..., None],
            min=1e-3,
        )

        log_sum_proj_k = jax.nn.logsumexp(log_proj_k_g, axis=-2, keepdims=True)
        log_sum_proj_k_local = jax.nn.logsumexp(w_log_proj_k, axis=-2, keepdims=True)
        log_sum_proj_k_nonlocal = log_add_exp(
            log_sum_proj_k, log_sum_proj_k_local, mask=(1, -1)
        )
        log_rfa_d = w_log_proj_q + log_sum_proj_k_nonlocal  # [b, h, g, w, c]

        # ---- local branch ----
        local_dots_mask = jnp.swapaxes(
            self.window_partition(
                kpm, seq_shape, ext_window_size=self.ext_size, pad_val=1.0
            ).astype(bool),
            -1, -2,
        )
        log_qk_local_dot = (
            jnp.einsum("bhwie,bhwje->bhwij", w_q, w_k,
                       preferred_element_type=jnp.float32) * self.scale
        ).astype(q.dtype)
        if self.rpe_enabled:
            log_qk_local_dot = self.add_rel_pos_bias(log_qk_local_dot)
        log_qk_local_dot = jnp.where(local_dots_mask, -jnp.inf, log_qk_local_dot)
        local_len = log_qk_local_dot.shape[-1]

        attn = jax.nn.softmax(
            jnp.concatenate([log_qk_local_dot, log_rfa_d], axis=-1), axis=-1
        )
        local_attn = attn[..., :local_len]
        rfa_attn = attn[..., local_len:]
        output_local = jnp.einsum("bhwij,bhwje->bhwie", local_attn, w_v)
        output_snis = jnp.einsum("bhwic,bhwce->bhwie", rfa_attn, kv_stats)

        output = self.window_merge(output_snis + output_local, seq_shape)
        x = jnp.swapaxes(output, 1, 2).reshape(B, N, C)
        x = self.proj(x)
        x = x[:, :orig_n]
        if self.attn_2d:
            # 2-D inputs keep their grid shape (``scatterbrain_attention.py:161``)
            x = x.reshape((B,) + tuple(seq_shape) + (C,))
        return self.proj_dropout(x, deterministic=deterministic)

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parent_parser = LocalAttention.add_attn_specific_args(
            parent_parser, struct_name=struct_name, prefix=prefix
        )
        parser = parent_parser.add_argument_group("Attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(parser, f"--{p}approx-attn-dim", struct_name=struct_name,
                            prefix=prefix, default=64, type=int)
        add_nested_argument(parser, f"--{p}proj-method", struct_name=struct_name,
                            prefix=prefix, default="favorp", type=str)
        add_nested_argument(parser, f"--{p}cos-weighting", struct_name=struct_name,
                            prefix=prefix, action="store_true", default=False)
        add_nested_argument(parser, f"--{p}sample-scheme", struct_name=struct_name,
                            prefix=prefix, default="default", type=str)
        return parent_parser
