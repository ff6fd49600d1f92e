"""LARA: linear randomized attention via multiple-importance sampling.

TPU-native rebuild of ``efficient-attention/efficient_attention/lara.py``
(ICML 2022).  Landmark proposals (pooled / adaptive) define a mixture of
RF proposal distributions; self-normalized MIS combines per-landmark
kv statistics with balance-heuristic (+ optimal-alpha) weights.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficient_attention_tpu.attention.base import MultiheadAttention, trunc_normal_init
from efficient_attention_tpu.ops.pooling import adaptive_avg_pool_2d, segment_mean_landmarks
from efficient_attention_tpu.ops.random_features import prm_projection

Array = jax.Array


class LinearRA(MultiheadAttention):
    """LARA (``lara.py:14-251``).

    Proposal generators (``lara.py:41-79``): ``pool`` / ``no-param-pool``
    (adaptive avg-pool landmarks, optional Linear+LN), ``adaptive-1d``
    (per-token Linear+LN then segment means); ``*-mixed`` / ``*-vmixed``
    suffixes mix key landmarks by softmax over their Gram logits
    (``lara.py:157-174``).  MIS weight types: ``mis-opt`` / ``mis-biased`` /
    ``mis-bh`` (``lara.py:214-236``).
    """

    num_landmarks: int = 49
    kernel_size: Optional[int] = None
    proposal_gen: str = "pool"
    use_antithetics: bool = False
    use_multisample: bool = False
    pool_module_type: str = "light"
    mis_type: str = "mis-opt"
    alpha_coeff: float = 1.0
    # 'auto' engages the fused SNIS kernel (ops/pallas/lara_fused.py) on
    # TPU eval mis-opt forwards; 'fused' raises if it cannot engage;
    # 'xla' keeps the reference-shaped composition everywhere
    impl: str = "auto"

    def setup(self):
        self._setup_projections()
        if self.pool_module_type == "dense":
            num_channels = self.dim
        elif self.pool_module_type == "light":
            num_channels = self.head_dim
        else:
            raise NotImplementedError(self.pool_module_type)
        self._proposal_channels = num_channels
        if self.proposal_gen.startswith("pool") or self.proposal_gen.startswith(
            "adaptive-1d"
        ):
            self.q_bar_gen = nn.Sequential(
                [nn.Dense(num_channels, kernel_init=trunc_normal_init,
                          bias_init=nn.initializers.zeros), nn.LayerNorm()],
                name="q_bar_gen",
            )
            self.k_bar_gen = nn.Sequential(
                [nn.Dense(num_channels, kernel_init=trunc_normal_init,
                          bias_init=nn.initializers.zeros), nn.LayerNorm()],
                name="k_bar_gen",
            )
        elif self.proposal_gen.startswith("no-param-pool"):
            pass
        else:
            raise NotImplementedError(self.proposal_gen)

    # ---- proposal generators -------------------------------------------------

    def _proposal_gen_1d(self, q, k, v, key_padding_mask: Optional[Array]):
        """Segment-mean landmarks over a 1-D sequence (``lara.py:84-127``).
        Returns the (possibly pad-zeroed) q/k/v the SNIS stage must keep
        using — the reference zeroes padded tokens BEFORE the segment
        means and downstream projections alike."""
        if key_padding_mask is not None:
            keep = 1.0 - key_padding_mask.astype(v.dtype)[:, None, :, None]
            q, k, v = q * keep, k * keep, v * keep
        if self.proposal_gen.startswith("adaptive-1d"):
            q2, k2 = self.q_bar_gen(q), self.k_bar_gen(k)
        else:
            q2, k2 = q, k
        q_bar = segment_mean_landmarks(q2, self.num_landmarks)
        k_bar = segment_mean_landmarks(k2, self.num_landmarks)
        return q_bar, k_bar, q, k, v

    def _proposal_gen_2d(self, x: Array, q, k, v,
                         key_padding_mask: Optional[Array]):
        """Pooled 2-D landmarks, dense or per-head light pools
        (``lara.py:129-175``)."""
        b, H, W, c = x.shape
        out_size = int(math.sqrt(self.num_landmarks))

        def pool_tokens(t: Array) -> Array:
            # [b, h, H*W, d] -> [b, h, landmarks, d] via channel-last pooling
            grid = t.reshape(b, self.num_heads, H, W, self.head_dim)
            grid = jnp.moveaxis(grid, -1, 2)  # [b, h, d, H, W]
            pooled = adaptive_avg_pool_2d(grid, out_size)  # [b, h, d, o, o]
            pooled = pooled.reshape(b, self.num_heads, self.head_dim, out_size**2)
            return jnp.swapaxes(pooled, -1, -2)  # [b, h, c, d]

        if self.pool_module_type == "dense":
            # pool the full-dim token grid, then Linear+LN over dim
            def pool_dense(t: Array) -> Array:
                grid = jnp.swapaxes(t, 1, 2).reshape(b, H, W, c)  # [b,H,W,C]
                grid = jnp.moveaxis(grid, -1, 1)  # [b, C, H, W]
                pooled = adaptive_avg_pool_2d(grid, out_size)
                pooled = pooled.reshape(b, c, out_size**2)
                return jnp.swapaxes(pooled, -1, -2)  # [b, o*o, C]

            q_pool, k_pool = pool_dense(q), pool_dense(k)
            if not self.proposal_gen.startswith("no-param-pool"):
                q_pool, k_pool = self.q_bar_gen(q_pool), self.k_bar_gen(k_pool)
            q_bar = jnp.swapaxes(
                q_pool.reshape(b, -1, self.num_heads, self.head_dim), 1, 2)
            k_bar = jnp.swapaxes(
                k_pool.reshape(b, -1, self.num_heads, self.head_dim), 1, 2)
        else:  # 'light': per-head pooling
            q_bar, k_bar = pool_tokens(q), pool_tokens(k)
            if not self.proposal_gen.startswith("no-param-pool"):
                q_bar, k_bar = self.q_bar_gen(q_bar), self.k_bar_gen(k_bar)

        if self.proposal_gen.endswith("mixed"):
            # mix key landmarks by softmax over their Gram logits (``lara.py:157-174``)
            k_logits = jnp.einsum("...pd,...cd->...pc", self.scale * k_bar, k_bar)
            if self.proposal_gen.endswith("-vmixed"):
                v_bar = pool_tokens(v)
                log_v_norm = jnp.log(
                    jnp.linalg.norm(v_bar, ord=2, axis=-1) + 1e-4
                )[..., None, :]
                k_logits = k_logits + log_v_norm
            k_bar = jnp.einsum(
                "...pc,...cd->...pd", jax.nn.softmax(k_logits, axis=-1), k_bar
            )
        return q_bar, k_bar

    # ---- forward --------------------------------------------------------------

    def __call__(
        self,
        x: Array,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """LARA forward (``lara.py:177-246``)."""
        B = x.shape[0]
        C = x.shape[-1]
        seq_shape = x.shape[1:-1]
        N = math.prod(seq_shape)
        # one fused qkv projection; the packed [B, N, 3HD] form feeds the
        # fused kernel directly, the split view feeds the proposal gens
        qkv_p = self.qkv(x.reshape(B, N, C))
        qkv5 = qkv_p.reshape(B, N, 3, self.num_heads, self.head_dim)
        q = jnp.swapaxes(qkv5[:, :, 0], 1, 2)
        k = jnp.swapaxes(qkv5[:, :, 1], 1, 2)
        v = jnp.swapaxes(qkv5[:, :, 2], 1, 2)
        if len(seq_shape) == 2:
            q_bar, k_bar = self._proposal_gen_2d(x, q, k, v,
                                                 key_padding_mask)
        else:
            q_bar, k_bar, q, k, v = self._proposal_gen_1d(
                q, k, v, key_padding_mask)
        mu = q_bar + k_bar

        if self._fused_ok(B, N, qkv_p, key_padding_mask, deterministic):
            return self._forward_fused(qkv_p, mu, q_bar, B, seq_shape, C,
                                       deterministic)

        # ---- sampling from the proposal (``lara.py:188-198``) ----
        if not deterministic:
            key = self.make_rng("sample")
            if self.use_multisample:
                noise = jax.random.normal(
                    key, (B, self.num_heads, mu.shape[-2] * 2, self.head_dim), mu.dtype)
                weights = jnp.tile(mu, (1, 1, 2, 1)) + noise
            elif self.use_antithetics:
                noise = jax.random.normal(key, mu.shape, mu.dtype)
                weights = jnp.concatenate([mu + noise, mu - noise], axis=-2)
            else:
                weights = mu + jax.random.normal(key, mu.shape, mu.dtype)
        else:
            weights = mu

        # ---- SNIS estimates (``lara.py:201-246``) ----
        log_proj_q = prm_projection(q, weights, normalize=False)  # [b, h, c, lq]
        log_proj_k = prm_projection(k, weights, normalize=False)  # [b, h, c, lk]
        if key_padding_mask is not None:
            log_proj_k = jnp.where(
                key_padding_mask[:, None, None, :].astype(bool), -jnp.inf, log_proj_k
            )
        kv_stats = jnp.einsum(
            "...cm,...md->...cd", jax.nn.softmax(log_proj_k, axis=-1), v
        )

        doubled = (not deterministic) and (self.use_multisample or self.use_antithetics)
        if self.mis_type == "mis-biased":
            log_proj_mu = prm_projection(mu, weights, normalize=False)
            log_alpha = jnp.einsum("...cd,...nd->...cn", self.scale * mu, q)
            if doubled:
                log_alpha = jnp.tile(log_alpha, (1, 1, 2, 1))
            log_proposal = jax.nn.logsumexp(log_proj_mu, axis=-1, keepdims=True)
        elif self.mis_type == "mis-opt":
            log_tnc = jnp.einsum("...cd,...nd->...cn", self.scale * q_bar, q)
            t_nc = jax.nn.softmax(log_tnc, axis=-1)
            if doubled:
                mu = jnp.tile(mu, (1, 1, 2, 1))
                t_nc = jnp.tile(t_nc, (1, 1, 2, 1))
            log_proj_mu = prm_projection(mu, weights, normalize=False)
            log_proposal = jnp.diagonal(log_proj_mu, axis1=-2, axis2=-1)[..., None]
            balance = jnp.exp(
                log_proposal - jax.nn.logsumexp(log_proj_mu, axis=-1, keepdims=True)
            )
            alpha_prev = balance + self.alpha_coeff * (
                t_nc - jnp.mean(t_nc, axis=-2, keepdims=True)
            )
            log_alpha = jnp.log(jnp.clip(alpha_prev, min=1e-8))
        elif self.mis_type == "mis-bh":
            log_proj_mu = prm_projection(mu, weights, normalize=False)
            log_alpha = 0.0
            log_proposal = jax.nn.logsumexp(log_proj_mu, axis=-1, keepdims=True)
        else:
            raise NotImplementedError(f"mis_type {self.mis_type}")

        log_true_prob = log_proj_q + jax.nn.logsumexp(log_proj_k, axis=-1, keepdims=True)
        log_iw_ratio = log_alpha + log_true_prob - log_proposal
        sniw = jax.nn.softmax(log_iw_ratio, axis=-2)  # [b, h, c, lq]
        output = jnp.einsum("...cn,...cd->...nd", sniw, kv_stats)

        x = jnp.swapaxes(output, 1, 2).reshape((B,) + tuple(seq_shape) + (C,))
        x = self.proj(x)
        return self.proj_dropout(x, deterministic=deterministic)

    # ---- fused SNIS kernel path (ops/pallas/lara_fused.py) -----------------

    def _fused_ok(self, B, N, qkv_p, key_padding_mask, deterministic):
        from efficient_attention_tpu.attention.base import on_tpu
        from efficient_attention_tpu.ops.pallas.lara_fused import (
            supports_lara_fused,
        )

        if self.impl == "xla":
            return False
        if self.impl == "auto" and not on_tpu():
            return False
        ok = (deterministic and self.mis_type == "mis-opt"
              and key_padding_mask is None
              and self.head_dim % 64 == 0
              and supports_lara_fused(B, N, qkv_p.shape[-1],
                                      self.num_landmarks,
                                      qkv_p.dtype.itemsize))
        if self.impl == "fused" and not ok:
            raise NotImplementedError(
                "impl='fused' requires TPU, deterministic mis-opt, no "
                "padding mask, head_dim % 64 == 0 and a supported geometry")
        return ok

    def _forward_fused(self, qkv_p, mu, q_bar, B, seq_shape, C,
                       deterministic):
        """Landmark-side terms in XLA (tiny [c, c] Gram), then the fused
        phase-1/phase-2 kernel over the packed qkv."""
        from efficient_attention_tpu.attention.base import on_tpu
        from efficient_attention_tpu.ops.pallas.lara_fused import (
            lara_attention_fused,
        )

        # eval: weights = mu (``lara.py:188-198`` sampling is train-only)
        log_proj_mu = prm_projection(mu, mu, normalize=False)  # [b,h,c,c]
        log_proposal = jnp.diagonal(log_proj_mu, axis1=-2, axis2=-1)
        balance = jnp.exp(
            log_proposal - jax.nn.logsumexp(log_proj_mu, axis=-1))
        out = lara_attention_fused(
            qkv_p, mu, q_bar, balance, log_proposal, self.scale,
            self.num_heads, alpha_coeff=self.alpha_coeff,
            interpret=not on_tpu())
        x = self.proj(out.reshape((B,) + tuple(seq_shape) + (C,)))
        return self.proj_dropout(x, deterministic=deterministic)

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parent_parser = MultiheadAttention.add_attn_specific_args(
            parent_parser, struct_name=struct_name, prefix=prefix
        )
        parser = parent_parser.add_argument_group("attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(parser, f"--{p}num-landmarks", struct_name=struct_name,
                            prefix=prefix, default=49, type=int)
        add_nested_argument(parser, f"--{p}kernel-size", struct_name=struct_name,
                            prefix=prefix, default=None, type=int)
        add_nested_argument(parser, f"--{p}pool-module-type", struct_name=struct_name,
                            prefix=prefix, default="light", type=str)
        add_nested_argument(parser, f"--{p}mis-type", struct_name=struct_name,
                            prefix=prefix, default="mis-opt", type=str)
        add_nested_argument(parser, f"--{p}proposal-gen", struct_name=struct_name,
                            prefix=prefix, default="pool", type=str)
        add_nested_argument(parser, f"--{p}use-antithetics", struct_name=struct_name,
                            prefix=prefix, action="store_true", default=False)
        add_nested_argument(parser, f"--{p}use-multisample", struct_name=struct_name,
                            prefix=prefix, action="store_true", default=False)
        add_nested_argument(parser, f"--{p}alpha-coeff", struct_name=struct_name,
                            prefix=prefix, default=1.0, type=float)
        return parent_parser
