"""EVA: control-variate fusion of exact local attention and RF global attention.

TPU-native rebuild of ``efficient-attention/efficient_attention/eva.py``
(ICLR 2023, "Efficient Attention via Control Variates").  The algorithm:

  1. blocked local attention over windows (optionally halo'd),
  2. chunked random-feature global attention: per-chunk adaptive proposal
     ``mu = (mu_q(mean q) + mu_k(mean k)) / 2``, one RF sample ``w ~ N(mu, I)``
     (mean at eval), per-chunk SNIS value summary ``beta``,
  3. a *single* softmax over the concatenation of local logits and per-chunk
     RF logits, so the control-variate correction and the normalizer fuse
     (``eva.py:222-227``).

The whole forward is per-(batch, head, window) block-local with a tiny
``[c, d]`` broadcast of ``rf_k_bar``/``beta`` — exactly the structure the
fused Pallas kernel exploits (see ``ops/pallas/eva_kernel.py``).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efficient_attention_tpu.attention.base import MASK_VAL, trunc_normal_init
from efficient_attention_tpu.attention.local import LocalAttention
from efficient_attention_tpu.ops.random_features import prm_projection
from efficient_attention_tpu.ops.rpe import t5_bucket_table

Array = jax.Array


def _on_tpu() -> bool:
    """True when the default device is a TPU (incl. tunneled 'axon' TPUs)."""
    try:
        dev = jax.devices()[0]
        return dev.platform in ("tpu", "axon") or "TPU" in str(dev)
    except Exception:
        return False


class T5RelativePositionBias(nn.Module):
    """Bucketed per-head relative position bias (``eva.py:15-65``).

    The bucket table is static for fixed (i, j) so it is precomputed in numpy
    and folded into the compiled program.
    """

    scale: float
    num_heads: int
    causal: bool = False
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, i: int, j: int, k_offset: int = 0) -> Array:
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(stddev=1.0),
            (self.num_buckets, self.num_heads),
        )
        buckets = t5_bucket_table(
            i, j, causal=self.causal, num_buckets=self.num_buckets,
            max_distance=self.max_distance, k_offset=k_offset,
        )
        bias = jnp.take(table, jnp.asarray(buckets.reshape(-1)), axis=0)
        bias = bias.reshape(i, j, self.num_heads)
        bias = jnp.transpose(bias, (2, 0, 1))[None, :, None]  # [1, h, 1, i, j]
        return bias * self.scale


class EVA(LocalAttention):
    """EVA attention (``eva.py:68-243``).

    Extra args over :class:`LocalAttention`:
      * ``adaptive_proj``: ``default`` (Linear+LN) / ``no-ln`` / ``none``
        (``eva.py:78-98``)
      * ``num_landmarks``: number of global RF chunks (``eva.py:118``)
      * ``use_t5_rpe``: T5-style local bias instead of learned-table RPE
    """

    adaptive_proj: str = "default"
    num_landmarks: int = 49
    use_t5_rpe: bool = False
    # 'auto' uses the fused Pallas kernel on TPU when the layout allows
    # (no padding mask, no halo); 'xla' forces the reference einsum path;
    # 'pallas' forces the kernel (errors if unsupported).
    impl: str = "auto"

    def setup(self):
        self._setup_projections()
        self._setup_rpe()
        if self.use_rpe and self.use_t5_rpe:
            raise NotImplementedError(
                "Default RPE and T5-style RPE cannot be enabled simultaneously."
            )
        if self.adaptive_proj in ("default", "no-ln"):
            layers = [nn.Dense(self.head_dim, kernel_init=trunc_normal_init,
                               bias_init=nn.initializers.zeros)]
            if self.adaptive_proj == "default":
                layers.append(nn.LayerNorm())
            self.adaptive_mu_q = nn.Sequential(layers, name="adaptive_mu_q")
            layers_k = [nn.Dense(self.head_dim, kernel_init=trunc_normal_init,
                                 bias_init=nn.initializers.zeros)]
            if self.adaptive_proj == "default":
                layers_k.append(nn.LayerNorm())
            self.adaptive_mu_k = nn.Sequential(layers_k, name="adaptive_mu_k")
        elif self.adaptive_proj == "none":
            self.adaptive_mu_k = nn.Sequential(
                [nn.Dense(self.head_dim, kernel_init=trunc_normal_init,
                          bias_init=nn.initializers.zeros), nn.LayerNorm()],
                name="adaptive_mu_k",
            )
        else:
            raise NotImplementedError(f"adaptive_proj={self.adaptive_proj}")
        if self.use_t5_rpe:
            self.rel_pos_bias = T5RelativePositionBias(
                scale=self.scale,
                num_heads=self.num_heads,
                causal=False,
                num_buckets=max(min((self.window_size + self.ext_size) // 2, 64), 16),
                max_distance=self.window_size + self.ext_size,
            )

    def __call__(
        self,
        x: Array,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """EVA forward (``eva.py:138-233``)."""
        B = x.shape[0]
        C = x.shape[-1]
        orig_n = math.prod(x.shape[1:-1])
        if self.attn_2d:
            seq_shape = x.shape[1:-1]
            assert len(seq_shape) == 2
            if self.window_size > 0:
                assert seq_shape[0] % self.window_size == 0
                assert seq_shape[1] % self.window_size == 0
        else:
            x = x.reshape(B, orig_n, C)
            if self.window_size > 0:
                from efficient_attention_tpu.ops import windows as W

                x = W.pad_to_multiple(x, self.window_size, axis=-2)
                N = x.shape[-2]
                if key_padding_mask is None:
                    if N != orig_n:
                        key_padding_mask = W.padding_mask_for(B, orig_n, N)
                else:
                    key_padding_mask = W.pad_to_multiple(
                        key_padding_mask, self.window_size, axis=-1, value=True
                    )
            seq_shape = (x.shape[-2],)
        N = math.prod(seq_shape)

        q, k, v = self.proj_and_split_heads(x)

        padding_free = key_padding_mask is None
        if key_padding_mask is None:
            key_padding_mask = jnp.zeros((B, N), dtype=bool)
        kpm = key_padding_mask.astype(q.dtype)[:, None, :, None]  # [b, 1, n, 1]

        if self.attn_2d:
            rf_win_size = int(math.sqrt(N // self.num_landmarks))
        else:
            rf_win_size = int(N // self.num_landmarks)
        rf_w_q = self.window_partition(
            q, seq_shape, window_size=rf_win_size, ext_window_size=self.ext_size)
        rf_w_k = self.window_partition(
            k, seq_shape, window_size=rf_win_size, ext_window_size=self.ext_size)
        rf_w_v = self.window_partition(
            v, seq_shape, window_size=rf_win_size, ext_window_size=self.ext_size)
        # [b, 1, c, j, 1]
        rf_w_mask = self.window_partition(
            kpm, seq_shape, window_size=rf_win_size,
            ext_window_size=self.ext_size, pad_val=1.0,
        ).astype(bool)
        rf_w_q = jnp.where(rf_w_mask, 0.0, rf_w_q)
        rf_w_k = jnp.where(rf_w_mask, 0.0, rf_w_k)
        rf_w_v = jnp.where(rf_w_mask, 0.0, rf_w_v)

        if self.adaptive_proj in ("default", "no-ln"):
            rf_q_bar = self.adaptive_mu_q(jnp.mean(rf_w_q, axis=-2))
            rf_k_bar = self.adaptive_mu_k(jnp.mean(rf_w_k, axis=-2))
            mu = 0.5 * (rf_q_bar + rf_k_bar)  # [b, h, c, d]
        else:  # 'none'
            rf_k_bar = self.adaptive_mu_k(jnp.mean(rf_w_k, axis=-2))
            mu = jnp.zeros_like(rf_k_bar)

        # ---- sample omega from the proposal (``eva.py:187-190``) ----
        if not deterministic:
            noise = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
            weights = mu + noise
        else:
            weights = mu

        # [b, h, c, j, d] x [b, h, c, 1, d] -> [b, h, c, j]
        log_proj_w_k = prm_projection(
            rf_w_k, weights[..., None, :], normalize=False
        )[..., 0, :]
        log_proj_w_k = jnp.where(rf_w_mask[..., 0], MASK_VAL, log_proj_w_k)
        # per-chunk SNIS value summary (``eva.py:192-196``)
        beta = jnp.einsum(
            "...cj,...cjd->...cd", jax.nn.softmax(log_proj_w_k, axis=-1), rf_w_v
        )

        # ---- fused Pallas kernel paths (local + chunk joint softmax in
        # VMEM; see ops/pallas/). Bit-compatible with the XLA path below
        # when no padding / halo is involved. Preference order:
        #   1. row-major kernel (zero layout transposes, 2-D square windows)
        #   2. Swin-layout kernel (windows pre-partitioned)
        #   3. XLA einsum path (always; also supplies gradients) ----
        pallas_ok = (
            self.impl in ("auto", "pallas", "rowmajor")
            and self.ext_size == 0
            and padding_free
            and self.attn_drop == 0.0
            and _on_tpu()
        )
        ws = self.window_size

        def _window_bias():
            if self.use_t5_rpe:
                i = j = ws * ws if self.attn_2d else ws
                return self.rel_pos_bias(i, j)[0, :, 0]  # [H, S, S]
            if self.rpe_enabled:
                if self.attn_2d:
                    bias = jnp.take(
                        self.local_relative_position_bias_table,
                        self._rpe_index, axis=0,
                    ).reshape(ws * ws, ws * ws, self.num_heads)
                    return jnp.transpose(bias, (2, 0, 1))
                return self.local_relative_position_bias_table
            return None

        # The zero-transpose row-major kernel measured slightly SLOWER than
        # the Swin-layout kernel end-to-end on v5e (the layout copies it
        # avoids turn out to be cheap; see ops/pallas/eva_rowmajor.py), so it
        # is opt-in via impl='rowmajor'.
        if self.impl == "rowmajor" and pallas_ok and self.attn_2d:
            from efficient_attention_tpu.ops.pallas.eva_rowmajor import (
                eva_attention_rowmajor,
                supports_rowmajor,
            )

            W_img = seq_shape[1]
            if (seq_shape[0] % ws == 0 and W_img % ws == 0
                    and supports_rowmajor(B, N, W_img, ws)):
                output = eva_attention_rowmajor(
                    q, k, v, rf_k_bar, beta, self.scale, W_img, ws,
                    bias=_window_bias())  # [B, H, N, D] token order
                x = jnp.swapaxes(output, 1, 2).reshape(
                    (B,) + tuple(seq_shape) + (C,))
                x = self.proj(x)
                return self.proj_dropout(x, deterministic=deterministic)

        w_q = self.window_partition(q, seq_shape, ext_window_size=0)
        w_k = self.window_partition(k, seq_shape, ext_window_size=self.ext_size)
        w_v = self.window_partition(v, seq_shape, ext_window_size=self.ext_size)

        from efficient_attention_tpu.ops.pallas.eva_kernel import supports_shapes

        use_pallas = pallas_ok and supports_shapes(
            B, w_q.shape[2], w_q.shape[3])
        if self.impl == "pallas" and not use_pallas:
            raise ValueError(
                "impl='pallas' requires TPU, no halo, and no padding mask")
        if use_pallas:
            from efficient_attention_tpu.ops.pallas.eva_kernel import (
                eva_attention_fused,
            )

            bias = _window_bias()
            output = eva_attention_fused(
                w_q, w_k, w_v, rf_k_bar, beta, self.scale, bias)
            output = self.window_merge(output, seq_shape)
            x = jnp.swapaxes(output, 1, 2).reshape(
                (B,) + tuple(seq_shape) + (C,))
            x = self.proj(x)
            x = x.reshape(B, N, C)[:, :orig_n]
            if self.attn_2d:
                x = x.reshape((B,) + tuple(seq_shape) + (C,))
            return self.proj_dropout(x, deterministic=deterministic)

        # approx expectation of CVs (``eva.py:200``)
        rfa_chunk = jnp.einsum("...wid,...cd->...wic", w_q, self.scale * rf_k_bar)
        num_rfa_chunks = rfa_chunk.shape[-1]

        # ---- local branch (``eva.py:204-218``) ----
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
        if self.use_t5_rpe:
            i, j = log_qk_local_dot.shape[-2:]
            log_qk_local_dot = log_qk_local_dot + self.rel_pos_bias(i, j)
        if self.rpe_enabled:
            log_qk_local_dot = self.add_rel_pos_bias(log_qk_local_dot)
        log_qk_local_dot = jnp.where(local_dots_mask, MASK_VAL, log_qk_local_dot)
        local_len = log_qk_local_dot.shape[-1]

        # ---- fused normalizer over [local | chunks] (``eva.py:222-227``) ----
        attn = jax.nn.softmax(
            jnp.concatenate([log_qk_local_dot, rfa_chunk], axis=-1), axis=-1
        )
        local_attn = attn[..., :local_len]
        ra_attn = attn[..., local_len:]
        output_local = jnp.einsum("bhwij,bhwjd->bhwid", local_attn, w_v)
        output_snis = jnp.einsum("bhwic,bhcd->bhwid", ra_attn, beta)

        output = self.window_merge(output_snis + output_local, seq_shape)
        x = jnp.swapaxes(output, 1, 2).reshape((B,) + tuple(seq_shape) + (C,))
        x = self.proj(x)
        x = x.reshape(B, N, C)[:, :orig_n]
        if self.attn_2d:
            x = x.reshape((B,) + tuple(seq_shape) + (C,))
        return self.proj_dropout(x, deterministic=deterministic)

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parent_parser = LocalAttention.add_attn_specific_args(
            parent_parser, struct_name=struct_name, prefix=prefix
        )
        parser = parent_parser.add_argument_group("attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(parser, f"--{p}adaptive-proj", struct_name=struct_name,
                            prefix=prefix, default="default", type=str)
        add_nested_argument(parser, f"--{p}num-landmarks", struct_name=struct_name,
                            prefix=prefix, default=49, type=int)
        add_nested_argument(parser, f"--{p}use-t5-rpe", action="store_true",
                            struct_name=struct_name, prefix=prefix, default=False)
        return parent_parser
