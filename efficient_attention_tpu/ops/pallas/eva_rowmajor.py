"""Row-major fused EVA attention: the zero-transpose 2-D path.

The dense block-diagonal kernel (``eva_kernel.py``) consumes Swin-partitioned
windows ``[B, H, G, S, D]``; producing that layout from the token grid costs
one transposed copy per tensor per layer.  This variant keeps q/k/v in the
natural row-major token order ``[B, H, N, D]`` (a free reshape of the
projection output): a row block of ``TGS = k * W * ws`` tokens covers ``k``
complete window-rows, so the same dense logits matmul works — the 2-D window
structure lives entirely in the visibility mask, computed in-kernel from
iota arithmetic (``window(t) = (t // (W*ws)) * (W/ws) + (t % W) // ws``),
and the RPE bias is pre-permuted into row-major coordinates once (static
index table).  Outputs come back in token order: no merge transpose either.

Requires: square ws x ws windows on a W-wide grid, ``W % ws == 0``, no halo,
no padding mask.  Falls back to the Swin-layout kernel otherwise.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VAL = -5e4


def _pick_rows(b: int, n: int, W: int, ws: int) -> Optional[Tuple[int, int]]:
    """(RB batch rows/step, TGS tokens/step): TGS must be a multiple of
    W*ws (whole window-rows) and of 8 (sublane tile)."""
    base = W * ws
    tgs = base
    while tgs % 8 != 0 and tgs < n:
        tgs += base
    if tgs % 8 != 0 or n % tgs != 0:
        return None
    for rb in (4, 2, 1):
        if b % rb == 0 and rb * tgs * (tgs + 128) * 4 <= 3_200_000:
            return rb, tgs
    return None


def supports_rowmajor(b: int, n: int, W: int, ws: int) -> bool:
    return W % ws == 0 and _pick_rows(b, n, W, ws) is not None


def rowmajor_bias_index(W: int, ws: int, tgs: int, c: int) -> np.ndarray:
    """Static ``[TGS, TGS + C]`` index into the flattened ``[S*S]`` per-window
    bias table (row-major token coords -> Swin-local coords); chunk columns
    and cross-window pairs map to 0 (masked out anyway)."""
    t = np.arange(tgs)
    win = (t // (W * ws)) * (W // ws) + (t % W) // ws
    local = ((t // W) % ws) * ws + (t % W) % ws
    same = win[:, None] == win[None, :]
    idx = np.where(same, local[:, None] * (ws * ws) + local[None, :], 0)
    # chunk columns index the sentinel zero entry appended at S*S (they are
    # NOT masked later, so their bias must be exactly 0)
    zero_idx = (ws * ws) * (ws * ws)
    return np.concatenate(
        [idx, np.full((tgs, c), zero_idx, np.int64)], axis=1)


def _kernel(q_ref, k_ref, v_ref, rf_ref, beta_ref, bias_ref, o_ref,
            *, scale: float, W: int, ws: int, tgs: int, c: int):
    qq = q_ref[:, 0]   # [RB, TGS, D]
    kk = k_ref[:, 0]
    vv = v_ref[:, 0]
    rr = rf_ref[:, 0]  # [RB, C, D]
    bt = beta_ref[:, 0]
    keys = jnp.concatenate([kk, rr], axis=1)
    vals = jnp.concatenate([vv, bt], axis=1)

    logits = jax.lax.dot_general(
        qq, keys, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [RB, TGS, TGS + C]
    # bias_ref carries BOTH the RPE bias and the cross-window mask
    # (MASK_VAL entries) — no in-kernel integer div/mod (VPU int division is
    # slow and this pattern is identical every step)
    logits = logits + bias_ref[0][None]

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "W", "ws", "interpret"))
def _fwd(q, k, v, rf_k_bar, beta, bias_rm, scale, W, ws, interpret=False):
    B, H, N, D = q.shape
    C = rf_k_bar.shape[2]
    RB, TGS = _pick_rows(B, N, W, ws)

    grid = (H, B // RB, N // TGS)
    row_spec = pl.BlockSpec((RB, 1, TGS, D), lambda h, b, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((RB, 1, C, D), lambda h, b, j: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, TGS, TGS + C), lambda h, b, j: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, scale=scale, W=W, ws=ws, tgs=TGS,
                               c=C)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, cd_spec, cd_spec, bias_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, rf_k_bar, beta, bias_rm)


def _xla_reference_rowmajor(q, k, v, rf_k_bar, beta, bias_rm, scale, W, ws):
    """Ground-truth row-major joint softmax in XLA (also the VJP source)."""
    B, H, N, D = q.shape
    t = np.arange(N)
    win = (t // (W * ws)) * (W // ws) + (t % W) // ws
    same = jnp.asarray(win[:, None] == win[None, :])
    local = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
    # bias_rm is per TGS-block; expand block-diagonally to [H, N, N]
    # (cross-block pairs are cross-window and masked below)
    tgs = bias_rm.shape[1]
    nblk = N // tgs
    eye = jnp.eye(nblk, dtype=bias_rm.dtype)
    bias_full = jnp.einsum(
        "tu,hij->htiuj", eye, bias_rm[:, :, :tgs]).reshape(H, N, N)
    local = local + bias_full[None]
    local = jnp.where(same[None, None], local, MASK_VAL)
    chunk = jnp.einsum("bhnd,bhcd->bhnc", q, rf_k_bar,
                       preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk], axis=-1), axis=-1).astype(v.dtype)
    return (jnp.einsum("bhnm,bhmd->bhnd", attn[..., :N], v)
            + jnp.einsum("bhnc,bhcd->bhnd", attn[..., N:], beta))


@functools.lru_cache(maxsize=None)
def _make_differentiable(scale, W, ws, interpret):
    @jax.custom_vjp
    def f(q, k, v, rf_k_bar, beta, bias_rm):
        return _fwd(q, k, v, rf_k_bar, beta, bias_rm, scale, W, ws,
                    interpret=interpret)

    def fwd(q, k, v, rf_k_bar, beta, bias_rm):
        return f(q, k, v, rf_k_bar, beta, bias_rm), (
            q, k, v, rf_k_bar, beta, bias_rm)

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: _xla_reference_rowmajor(*a, scale, W, ws), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def eva_attention_rowmajor(
    q: jax.Array,  # [B, H, N, D] row-major token order
    k: jax.Array,
    v: jax.Array,
    rf_k_bar: jax.Array,  # [B, H, C, D]
    beta: jax.Array,
    scale: float,
    W: int,   # grid width (tokens per image row)
    ws: int,  # window side
    bias: Optional[jax.Array] = None,  # [H, S, S] Swin-local bias
    interpret: bool = False,
) -> jax.Array:
    """Zero-transpose fused EVA attention for square 2-D windows."""
    B, H, N, D = q.shape
    C = rf_k_bar.shape[2]
    _, TGS = _pick_rows(B, N, W, ws)
    # visibility pattern (static): same window, or a chunk column
    t = np.arange(TGS)
    win = (t // (W * ws)) * (W // ws) + (t % W) // ws
    vis = np.concatenate(
        [win[:, None] == win[None, :], np.ones((TGS, C), bool)], axis=1)
    mask_add = jnp.asarray(np.where(vis, 0.0, MASK_VAL), jnp.float32)
    if bias is None:
        bias_rm = jnp.broadcast_to(mask_add, (H, TGS, TGS + C))
    else:
        # permute the [S, S] bias into row-major coords via two small
        # permutation matmuls (a 173K-element scalar gather is ~1ms/layer
        # on TPU; the matmul route is ~free): bias_rm = R @ bias @ R^T,
        # cross-window entries are wrong but masked by mask_add
        local = ((t // W) % ws) * ws + (t % W) % ws
        R = np.zeros((TGS, ws * ws), np.float32)
        R[np.arange(TGS), local] = 1.0
        Rj = jnp.asarray(R)
        bias_tok = jnp.einsum("tl,hlm,um->htu", Rj,
                              bias.astype(jnp.float32), Rj)
        bias_rm = jnp.pad(bias_tok, ((0, 0), (0, 0), (0, C))) + mask_add
    f = _make_differentiable(float(scale), W, ws, interpret)
    return f(q, k, v, rf_k_bar, beta, bias_rm)
