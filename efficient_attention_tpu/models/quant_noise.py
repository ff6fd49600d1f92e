"""Quantization noise (iPQ) — structured block dropout of weight matrices.

TPU-native rebuild of ``fairseq/modules/quant_noise.py`` ("Training with
Quantization Noise for Extreme Model Compression"; the reference also
copies it into ``efficient_attention/causal_eva.py:118-215`` to stay
fairseq-free): during training, drop whole ``block_size``-sized blocks of
the weight's input dimension — the blocks iPQ would quantize together —
with probability ``p`` and rescale survivors by ``1/(1-p)``, so the model
learns to be robust to whole-block quantization error.  Eval uses the
clean weights.

The reference wraps ``nn.Linear`` with a forward-pre-hook; the flax form
is a Dense whose kernel is masked inside ``__call__`` (masking is
elementwise on the kernel and fuses into the matmul's producer under XLA).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class QuantNoiseDense(nn.Module):
    """``nn.Dense`` with iPQ quantization noise on the kernel.

    Matches ``quant_noise.py:63-78`` (non-quantized Linear case): the mask
    is drawn per ``(input-block, output-unit)`` — each output unit drops
    its own set of ``block_size``-wide input blocks.  Requires
    ``in_features % block_size == 0`` (asserted by the reference too).
    """

    features: int
    p: float = 0.0
    block_size: int = 8
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.dtype is not None:
            # nn.Dense compute-dtype semantics: the kernel/bias casts below
            # follow x's dtype
            x = x.astype(self.dtype)
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features))
        if self.p > 0.0 and not deterministic:
            assert in_features % self.block_size == 0, (
                f"quant-noise block size {self.block_size} must divide "
                f"in_features {in_features}")
            nb = in_features // self.block_size
            drop = jax.random.bernoulli(
                self.make_rng("dropout"), self.p, (nb, self.features))
            mask = jnp.repeat(drop, self.block_size, axis=0)
            kernel = jnp.where(mask, 0.0, kernel) / (1.0 - self.p)
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def qn_call(mod: nn.Module, x: Array, deterministic: bool = True) -> Array:
    """Call a projection that may or may not carry quant noise — plain
    ``nn.Dense`` takes no ``deterministic``."""
    if isinstance(mod, QuantNoiseDense):
        return mod(x, deterministic=deterministic)
    return mod(x)


def dense(features: int, p: float = 0.0, block_size: int = 8, **kw):
    """``nn.Dense`` when ``p == 0`` (identical params/structure), else
    :class:`QuantNoiseDense` — so enabling quant noise never changes the
    checkpoint layout (both store ``kernel``/``bias``)."""
    if p <= 0.0:
        kw.pop("block_size", None)
        return nn.Dense(features, **kw)
    return QuantNoiseDense(features, p=p, block_size=block_size, **kw)
