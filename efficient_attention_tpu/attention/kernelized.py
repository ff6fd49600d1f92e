"""Kernelized (linear) attention: Performer/FAVOR+, RFA, DPFP, cosFormer.

TPU-native rebuild of ``efficient-attention/efficient_attention/
kernelized_attention.py``.  PyTorch's implicit train-time RNG (fresh Gaussian
projections each step, ``kernelized_attention.py:312-324``) becomes an
explicit ``sample`` RNG stream; the eval-time fixed orthogonal projection is
derived from a constant key so it constant-folds under jit.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficient_attention_tpu.attention.base import MultiheadAttention, trunc_normal_init
from efficient_attention_tpu.ops.random_features import (
    cos_reweighted_linear_attention,
    create_proj_matrix,
    dpfp_projection,
    favorp_projection,
    fourier_projection,
    generalized_projection,
    linear_attention,
    nonlinear_map,
)

Array = jax.Array

_RANDOM_PROJ_METHODS = ("favorp", "relu", "fourier")


class DeterministicLearnableFourierFeatures(nn.Module):
    """Learnable MLP-on-Fourier feature map
    (``kernelized_attention.py:159-183``)."""

    num_heads: int
    dim: int
    fourier_dim: int
    std: float = 0.02

    @nn.compact
    def __call__(self, x: Array, is_query: bool = False) -> Array:
        random_proj = self.param(
            "random_proj",
            nn.initializers.normal(stddev=self.std),
            (self.num_heads, self.fourier_dim // 2, self.dim),
        )
        projected = jnp.einsum("bn...d,njd->bn...j", x, random_proj)
        feat = jnp.concatenate([jnp.cos(projected), jnp.sin(projected)], axis=-1)
        feat = nn.Dense(self.fourier_dim)(feat * (self.dim**-0.5))
        return jax.nn.relu(feat)


class KernelizedAttention(MultiheadAttention):
    """Linear attention with pluggable feature maps
    (``kernelized_attention.py:223-360``)."""

    approx_attn_dim: int = 64
    proj_method: str = "favorp"
    cos_weighting: bool = False
    sample_scheme: str = "default"
    # 'auto' engages the fused FAVOR+ kernel (ops/pallas/performer_fused.py)
    # on TPU eval favorp forwards at long sequences; 'fused' raises if it
    # cannot engage; 'xla' keeps the reference-shaped composition everywhere
    impl: str = "auto"
    # Measured crossover on a v5e chip (scripts/bench_performer_kernel.py,
    # B=128, dim 192, h=3, m=64, bf16): the kernel loses to XLA's fused
    # composition below ~seq 1536 (784: 1.79 vs 1.52 ms; 1024: 2.31 vs
    # 2.04) and wins above it (1600: 3.25 vs 3.48; 3136: 7.13 vs 8.81,
    # 1.24x) where the materialized fp32 prime maps exceed ~150 MB each
    # and HBM traffic dominates.  'auto' only engages past the crossover.
    AUTO_MIN_SEQ = 1536

    @property
    def use_random_proj(self) -> bool:
        return self.proj_method in _RANDOM_PROJ_METHODS

    def setup(self):
        self._setup_projections()
        if self.proj_method == "dpfp":
            nu = (self.approx_attn_dim // self.head_dim) // 2
            assert nu > 0, "approx_attn_dim must be a multiple of 2*head_dim!"
            self._nu = nu
        elif self.proj_method == "mlp-fourier":
            self.feature_proj_module = DeterministicLearnableFourierFeatures(
                num_heads=self.num_heads,
                dim=self.head_dim,
                fourier_dim=self.approx_attn_dim,
            )
        elif self.use_random_proj:
            if self.sample_scheme == "learnable":
                self.random_proj = self.param(
                    "random_proj",
                    lambda key, shape: create_proj_matrix(
                        key, self.num_heads, self.approx_attn_dim, self.head_dim,
                        ortho=True,
                    ),
                    (self.num_heads, self.approx_attn_dim, self.head_dim),
                )
            elif self.sample_scheme not in ("default", "fixed"):
                raise NotImplementedError(f"sample scheme {self.sample_scheme}")
        elif self.proj_method in ("relu-only", "sigmoid-only"):
            pass
        else:
            raise NotImplementedError(f"proj_method {self.proj_method}")

    def get_proj_matrix(self, deterministic: bool, dtype) -> Optional[Array]:
        """Projection-matrix sampling policy (``kernelized_attention.py:312-324``):
        fresh Gaussian per training step, fixed orthogonal buffer at eval."""
        if not self.use_random_proj:
            return None
        if self.sample_scheme == "learnable":
            return self.random_proj
        if self.sample_scheme == "fixed" or deterministic:
            # eval buffer: deterministic orthogonal Gaussian from a constant
            # key (reference seeds 0 + 1000*h, ``kernelized_attention.py:250-258``)
            return create_proj_matrix(
                jax.random.PRNGKey(0), self.num_heads, self.approx_attn_dim,
                self.head_dim, ortho=True, dtype=dtype,
            )
        return create_proj_matrix(
            self.make_rng("sample"), self.num_heads, self.approx_attn_dim,
            self.head_dim, ortho=False, dtype=dtype,
        )

    def q_k_projection(self, q: Array, k: Array, random_proj: Optional[Array]):
        """Feature-map dispatch (``kernelized_attention.py:280-296``)."""
        if self.proj_method == "favorp":
            fp = partial(favorp_projection, projection=random_proj)
        elif self.proj_method == "fourier":
            fp = partial(fourier_projection, projection=random_proj)
        elif self.proj_method == "relu":
            fp = partial(generalized_projection, projection=random_proj,
                         projection_fn=jax.nn.relu)
        elif self.proj_method == "dpfp":
            fp = partial(dpfp_projection, nu=self._nu)
        elif self.proj_method == "mlp-fourier":
            fp = self.feature_proj_module
        elif self.proj_method == "relu-only":
            fp = partial(nonlinear_map, mapping_fn=jax.nn.relu)
        elif self.proj_method == "sigmoid-only":
            fp = partial(nonlinear_map, mapping_fn=jax.nn.sigmoid)
        else:
            raise NotImplementedError
        return fp(q, is_query=True), fp(k, is_query=False)

    def _linear_attention(self, q_prime: Array, k_prime: Array, v: Array) -> Array:
        if self.cos_weighting:
            return cos_reweighted_linear_attention(q_prime, k_prime, v)
        return linear_attention(q_prime, k_prime, v)

    # ---- fused FAVOR+ kernel path (ops/pallas/performer_fused.py) ----------

    def _fused_ok(self, B, N, three_hd, key_padding_mask, deterministic,
                  itemsize) -> bool:
        from efficient_attention_tpu.attention.base import on_tpu
        from efficient_attention_tpu.ops.pallas.performer_fused import (
            supports_performer_fused,
        )

        if self.impl == "xla":
            return False
        if self.impl == "auto" and (not on_tpu() or N < self.AUTO_MIN_SEQ):
            return False
        ok = (deterministic and self.proj_method == "favorp"
              and not self.cos_weighting
              and self.sample_scheme in ("default", "fixed", "learnable")
              and key_padding_mask is None
              and supports_performer_fused(B, N, three_hd,
                                           self.approx_attn_dim, itemsize))
        if self.impl == "fused" and not ok:
            raise NotImplementedError(
                "impl='fused' requires TPU, deterministic favorp without "
                "cos-weighting or a padding mask, and a supported geometry")
        return ok

    def __call__(
        self,
        x: Array,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        B = x.shape[0]
        C = x.shape[-1]
        seq_shape = x.shape[1:-1]
        N = math.prod(seq_shape)
        if self._fused_ok(B, N, 3 * self.dim, key_padding_mask,
                          deterministic,
                          4 if x.dtype == jnp.float32 else x.dtype.itemsize):
            from efficient_attention_tpu.attention.base import on_tpu
            from efficient_attention_tpu.ops.pallas.performer_fused import (
                performer_attention_fused,
            )

            # packed [B, N, 3HD] straight into the kernel: qkv read from
            # HBM once, the prime maps never materialize
            qkv_p = self.qkv(x.reshape(B, N, C))
            proj = self.get_proj_matrix(deterministic, x.dtype)
            out = performer_attention_fused(
                qkv_p, proj, self.num_heads, interpret=not on_tpu())
            out = self.proj(out.reshape((B,) + tuple(seq_shape) + (C,)))
            return self.proj_dropout(out, deterministic=deterministic)
        return super().__call__(x, key_padding_mask, deterministic)

    def _apply_attention(
        self,
        q: Array,
        k: Array,
        v: Array,
        key_padding_mask: Optional[Array],
        deterministic: bool,
    ) -> Array:
        projection_matrix = self.get_proj_matrix(deterministic, q.dtype)
        q_prime, k_prime = self.q_k_projection(q, k, projection_matrix)
        if key_padding_mask is not None:
            k_prime = jnp.where(
                key_padding_mask[:, None, :, None].astype(bool), 0.0, k_prime
            )
        # linear attention runs in fp32 (``kernelized_attention.py:345``)
        out = self._linear_attention(
            q_prime.astype(jnp.float32), k_prime.astype(jnp.float32),
            v.astype(jnp.float32),
        )
        return out.astype(q.dtype)

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parent_parser = MultiheadAttention.add_attn_specific_args(
            parent_parser, struct_name=struct_name, prefix=prefix
        )
        parser = parent_parser.add_argument_group("Attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(parser, f"--{p}approx-attn-dim", struct_name=struct_name,
                            prefix=prefix, default=64, type=int,
                            help="number of random features")
        add_nested_argument(parser, f"--{p}proj-method", struct_name=struct_name,
                            prefix=prefix, default="favorp", type=str,
                            help="which random feature is used for RFA")
        add_nested_argument(parser, f"--{p}cos-weighting", struct_name=struct_name,
                            prefix=prefix, action="store_true", default=False)
        add_nested_argument(parser, f"--{p}sample-scheme", struct_name=struct_name,
                            prefix=prefix, default="default", type=str)
        return parent_parser
