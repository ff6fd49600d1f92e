"""Monotonic-attention expected alignment (simultaneous translation).

TPU-native port of the reference's alignment-train operator
(``fairseq/examples/operators/alignment_train_cpu.cpp:80-133`` and its
CUDA twin): given per-step selection probabilities ``p_choose`` it
computes the expected alignment ``alpha`` of the monotonic attention
process (Raffel et al. 2017),

    alpha_t = p_t * exclusive_cumprod(1 - p_t)
                  * cumsum_src(alpha_{t-1} / clamp(excl_cumprod, eps, 1))

The reference hand-rolls the target-dimension recurrence in C++/CUDA; on
TPU it is a ``lax.scan`` over target rows with vectorized source-axis
cumsum/cumprod — jit/grad-compatible, so the op can sit inside a training
step (the reference's is forward-only, with gradients flowing through
``p_choose`` via a separate torch graph).

A native CPU twin lives in ``native/eatpu_native.cpp``
(``eatpu_alignment_train``), parity-tested against this implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def expected_alignment_from_p_choose(
    p_choose: Array, eps: float = 1e-6) -> Array:
    """alpha ``[B, T, S]`` from ``p_choose [B, T, S]``.

    Matches ``alignmentTrainCPUImpl`` element-for-element, including the
    output clamp to [0, 1] and the eps clamp on the cumprod denominator.
    """
    B, T, S = p_choose.shape
    dtype = jnp.promote_types(p_choose.dtype, jnp.float32)
    p = p_choose.astype(dtype)
    one_m = 1.0 - p
    # exclusive cumprod along src (alignment_train_cpu.cpp:14-52)
    cumprod_ex = jnp.concatenate(
        [jnp.ones((B, T, 1), dtype), jnp.cumprod(one_m, axis=-1)[:, :, :-1]],
        axis=-1)
    denom = jnp.clip(cumprod_ex, eps, 1.0)

    init = jnp.zeros((B, S), dtype).at[:, 0].set(1.0)

    def step(prev_alpha, row):
        p_row, cpe_row, dn_row = row               # each [B, S]
        scan = jnp.cumsum(prev_alpha / dn_row, axis=-1)
        out = jnp.clip(scan * p_row * cpe_row, 0.0, 1.0)
        return out, out

    rows = (jnp.moveaxis(p, 1, 0), jnp.moveaxis(cumprod_ex, 1, 0),
            jnp.moveaxis(denom, 1, 0))
    _, alphas = jax.lax.scan(step, init, rows)
    return jnp.moveaxis(alphas, 0, 1).astype(p_choose.dtype)
