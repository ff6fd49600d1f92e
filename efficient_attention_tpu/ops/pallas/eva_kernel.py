"""Fused EVA attention forward kernel (Pallas/Mosaic, TPU).

Implements SURVEY §3.5 steps 3-9 (``eva.py:138-233``) as ONE kernel: the
joint ``[local | chunk]`` structure is realized literally — keys are
``[window_k | rf_k_bar]`` and values ``[window_v | beta]`` — so each step is
two MXU matmuls and one softmax, and the ``[b, h, w, i, j]`` logit tensor
never touches HBM (the XLA path materializes it every layer).

Design
------
Inputs are window-partitioned ``[B, H, G, S, D]`` and rearranged head-major
``[H, B, G*S, D]`` so the per-head RPE bias block stays VMEM-resident across
all inner grid steps.  Grid: ``(H, B // RB, G // TG)``.  Each step fuses
``TG`` consecutive windows into ONE dense ``[TG*S, TG*S + C]`` logit matmul
per batch row — the off-block-diagonal FLOPs are wasted, but a dense matmul
beats a ``TG*RB``-deep loop of tiny per-window matmuls on the MXU by ~3x
(measured), and the kernel stays HBM-bound.  Off-diagonal logits are masked
to ``MASK_VAL`` before the joint softmax; chunk columns are always visible.

Tile constraints: Mosaic requires the sublane dim divisible by 8, so
``TG * S % 8 == 0`` (TG=8 for the DeiT window 7x7=49).  ``supports_shapes``
reports whether a given geometry can use the kernel; callers fall back to
the XLA path otherwise (also when a padding mask or halo is present).

The backward pass currently reuses the pure-JAX path (forward speed is what
the serving/throughput path needs; a fused backward is future work).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VAL = -5e4


def _pick_tiles(b: int, g: int, s: int) -> Optional[Tuple[int, int]]:
    """(RB batch rows/step, TG windows/step) or None if unsupported."""
    tg = None
    for cand in (8, 16, 4, 2, 1):
        if g % cand == 0 and (cand * s) % 8 == 0:
            tg = cand
            break
    if tg is None:
        return None
    tgs = tg * s
    # fp32 logit tile [RB, TGS, TGS + C]; keep ~<=3MB so intermediates +
    # double-buffered IO fit in 16MB VMEM
    for rb in (4, 2, 1):
        if b % rb == 0 and rb * tgs * (tgs + 128) * 4 <= 3_200_000:
            return rb, tg
    return None


def supports_shapes(b: int, g: int, s: int) -> bool:
    return _pick_tiles(b, g, s) is not None


def _eva_kernel(q_ref, k_ref, v_ref, rf_ref, beta_ref, bias_ref, o_ref,
                *, scale: float, s: int, c: int, tgs: int):
    """One grid step: RB batch rows of one head, TG windows fused densely."""
    qq = q_ref[:, 0]   # [RB, TGS, D]
    kk = k_ref[:, 0]   # [RB, TGS, D]
    vv = v_ref[:, 0]   # [RB, TGS, D]
    rr = rf_ref[:, 0]  # [RB, C, D]
    bt = beta_ref[:, 0]
    keys = jnp.concatenate([kk, rr], axis=1)  # [RB, TGS + C, D]
    vals = jnp.concatenate([vv, bt], axis=1)

    logits = jax.lax.dot_general(
        qq, keys, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [RB, TGS, TGS + C]
    # resident per-head bias: block-diag-expanded RPE + MASK_VAL on
    # off-diagonal entries (mask folded in — in-kernel integer div for the
    # window pattern is slow VPU work and identical every step)
    logits = logits + bias_ref[0][None]

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _eva_fused_fwd(w_q, w_k, w_v, rf_k_bar, beta, bias, scale,
                   interpret=False):
    B, H, G, S, D = w_q.shape
    C = rf_k_bar.shape[2]
    tiles = _pick_tiles(B, G, S)
    assert tiles is not None, "unsupported geometry; check supports_shapes"
    RB, TG = tiles
    TGS = TG * S

    # natural layout, free reshapes only — BlockSpec addresses the (b, h)
    # hyper-rectangles directly, so no head-major transpose copies
    q2 = w_q.reshape(B, H, G * S, D)
    k2 = w_k.reshape(B, H, G * S, D)
    v2 = w_v.reshape(B, H, G * S, D)
    rf2, beta2 = rf_k_bar, beta

    # expand the per-window bias [H, S, S] to [H, TGS, TGS + C] with the
    # off-block-diagonal mask folded in as MASK_VAL.  The expansion is done
    # as two tiny permutation matmuls: (P @ bias @ P^T)[t, u] =
    # bias[t mod S, u mod S] everywhere — wrong on cross-window entries, but
    # those get MASK_VAL added so the error never survives the softmax.
    # (A literal eye-einsum block-diag expansion costs ~1ms/call in XLA —
    # 2.4x the kernel itself — because of its scatter-shaped reshape.)
    import numpy as np

    t = np.arange(TGS)
    vis = np.concatenate(
        [(t[:, None] // S) == (t[None, :] // S), np.ones((TGS, C), bool)],
        axis=1)
    mask_add = jnp.asarray(np.where(vis, 0.0, MASK_VAL), jnp.float32)
    if bias is None:
        big_bias = jnp.broadcast_to(mask_add, (H, TGS, TGS + C))
    else:
        P = np.zeros((TGS, S), np.float32)
        P[t, t % S] = 1.0
        Pj = jnp.asarray(P)
        tiled = jnp.einsum("ti,hij,uj->htu", Pj, bias.astype(jnp.float32),
                           Pj)
        big_bias = jnp.pad(tiled, ((0, 0), (0, 0), (0, C))) + mask_add

    grid = (H, B // RB, G // TG)
    row_spec = pl.BlockSpec((RB, 1, TGS, D), lambda h, b, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((RB, 1, C, D), lambda h, b, j: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, TGS, TGS + C), lambda h, b, j: (h, 0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_eva_kernel, scale=scale, s=S, c=C, tgs=TGS)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, cd_spec, cd_spec, bias_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(q2.shape, w_q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        # two dense matmuls of [TGS, D] x [D, TGS+C] per (b, h, window-group),
        # with B*H*(G/TG) groups
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (B * H * (G // TG)) * TGS * (TGS + C) * D,
            bytes_accessed=4 * B * H * G * S * D * 2,
            transcendentals=B * H * G * S * (TGS + C),
        ),
        interpret=interpret,
    )(q2, k2, v2, rf2, beta2, big_bias)
    return out.reshape(B, H, G, S, D)


def _xla_reference(w_q, w_k, w_v, rf_k_bar, beta, bias, scale):
    """Pure-XLA joint softmax, used to derive the backward pass (and as the
    semantic ground truth in tests)."""
    local = jnp.einsum("bhgid,bhgjd->bhgij", w_q, w_k,
                       preferred_element_type=jnp.float32) * scale
    if bias is not None:
        local = local + bias[None, :, None].astype(local.dtype)
    chunk = jnp.einsum("bhgid,bhcd->bhgic", w_q, rf_k_bar,
                       preferred_element_type=jnp.float32) * scale
    s = local.shape[-1]
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk], axis=-1), axis=-1).astype(w_v.dtype)
    return (jnp.einsum("bhgij,bhgjd->bhgid", attn[..., :s], w_v)
            + jnp.einsum("bhgic,bhcd->bhgid", attn[..., s:], beta))


@functools.lru_cache(maxsize=None)
def _make_differentiable(scale: float, has_bias: bool, interpret: bool):
    """custom_vjp wrapper: Pallas forward, XLA-derived backward (the joint
    softmax is recomputed in the backward — remat-style, cheap relative to
    the full layer)."""

    @jax.custom_vjp
    def f(w_q, w_k, w_v, rf_k_bar, beta, bias):
        return _eva_fused_fwd(w_q, w_k, w_v, rf_k_bar, beta,
                              bias if has_bias else None, scale,
                              interpret=interpret)

    def fwd(w_q, w_k, w_v, rf_k_bar, beta, bias):
        out = f(w_q, w_k, w_v, rf_k_bar, beta, bias)
        return out, (w_q, w_k, w_v, rf_k_bar, beta, bias)

    def bwd(res, g):
        w_q, w_k, w_v, rf_k_bar, beta, bias = res
        ref = lambda q, k, v, r, b, bi: _xla_reference(  # noqa: E731
            q, k, v, r, b, bi if has_bias else None, scale)
        _, vjp = jax.vjp(ref, w_q, w_k, w_v, rf_k_bar, beta, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def eva_attention_fused(
    w_q: jax.Array,
    w_k: jax.Array,
    w_v: jax.Array,
    rf_k_bar: jax.Array,
    beta: jax.Array,
    scale: float,
    bias: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused EVA attention over pre-partitioned windows (differentiable).

    Args:
      w_q/w_k/w_v: ``[B, H, G, S, D]`` window-partitioned projections (no halo)
      rf_k_bar/beta: ``[B, H, C, D]`` chunk summaries
      bias: optional ``[H, S, S]`` per-window local bias (RPE/T5)
      interpret: run in Pallas interpreter mode (CPU testing)
    Returns: ``[B, H, G, S, D]``
    """
    has_bias = bias is not None
    if bias is None:  # keep the custom_vjp signature uniform
        bias = jnp.zeros((w_q.shape[1], w_q.shape[3], w_q.shape[3]),
                         jnp.float32)
    f = _make_differentiable(float(scale), has_bias, interpret)
    return f(w_q, w_k, w_v, rf_k_bar, beta, bias)
