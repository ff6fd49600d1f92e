"""Packed-layout fused EVA attention: zero-transpose, zero-relayout.

The decisive cost of a Pallas attention kernel inside a jitted ViT layer is
not its FLOPs — it is the *fusion boundary*: a custom call forces XLA to
materialize its operands, so a kernel that wants head-major ``[B, H, N, D]``
inputs makes the producer materialize three transposed copies (and the
consumer un-transpose the output).  Measured on v5e this costs ~2.5x the
kernel's own runtime.

This kernel therefore consumes the raw fused-projection output
``qkv = x @ W_qkv`` in its natural ``[B, N, 3*H*D]`` layout (one operand,
one DMA stream) and writes ``[B, N, H*D]`` — exactly the layout the output
projection wants.  Heads live in the lane dimension and are extracted with
static in-kernel lane slices (D = head_dim multiples of 64 keep these on
vreg boundaries).  Chunk summaries ``rf_k_bar``/``beta`` arrive packed as
``[B, C, H*D]`` likewise.

Window structure is row-major (as in ``eva_rowmajor.py``): a grid step
covers one window-row strip of ``TGS = W * ws`` tokens (the smallest row
block containing whole windows — smaller strips cut masked exp waste and
logits lane-tiles); the cross-window visibility pattern and the RPE bias
are folded into a resident per-head additive table ``[H, TGS, TGS]`` built
with two tiny permutation matmuls (cross-window entries of the permuted
bias are wrong but carry MASK_VAL, so they never survive the softmax).

Reference semantics: the joint ``softmax([local | chunk])`` of
``efficient-attention/efficient_attention/eva.py:200-227``.
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

# Backward VMEM working-set budget (bytes) under the 100MB scoped limit;
# module-level so bench scripts can sweep it like causal_packed.BWD_BUDGET
# (sweeps must clear _bwd_fused's jit cache AND _make_differentiable's
# lru_cache, or run in a fresh process).
BWD_BUDGET = 36_000_000


def _pick_rows(b: int, n: int, W: int, ws: int,
               c: int = 0) -> Optional[Tuple[int, int]]:
    """(RB batch rows/step, TGS tokens/step).

    TGS = one full window-row strip (W*ws tokens): the smallest row block
    containing whole windows.  Smaller strips directly cut the masked
    VPU/exp waste AND the lane-tiles per logits row, and the 8-divisibility
    rule is dodged by reshaping the token axis to [n/TGS, TGS] outside the
    kernel — a free reshape — so TGS becomes a full (hence layout-legal)
    block dimension.

    ``c`` is the number of chunk columns (EVA's num_landmarks; 0 for the
    chunk-less local kernel).  The budget floors it at 128 so small-C picks
    match the round-2 tuning, but a C >> 128 config shrinks RB (or bails to
    the XLA path) instead of blowing the scoped-VMEM allocation.
    """
    tgs = W * ws
    if tgs <= 0 or n % tgs != 0:
        return None
    cols = tgs + max(c, 128)
    # RB=32 raced at 4704 img/s e2e — inside the RB=16 noise
    # band (4682-4720); the validated RB=16 ceiling stands
    for rb in (16, 8, 4, 2, 1):
        # fp32 joint logits [RB, TGS, TGS+C] dominate VMEM.  RB=16
        # previously failed IN-MODEL against the default 16MB scoped-VMEM
        # cap (19.0M with the surrounding projections' headroom) although
        # it won standalone; raising ``vmem_limit_bytes`` to 100MB on the
        # pallas_call (round 3, session 2) admits it everywhere and is a
        # measured e2e win at the bench geometry: 4356 -> 4694 img/s
        # (+7.8%), parity unchanged (7.8e-5 f32 on-chip).
        if b % rb == 0 and rb * tgs * cols * 4 <= 6_500_000:
            return rb, tgs
    return None


def supports_packed(b: int, n: int, W: int, ws: int, c: int = 0) -> bool:
    return W % ws == 0 and ws > 0 and _pick_rows(b, n, W, ws, c) is not None


def _rowmajor_vis(W: int, ws: int, tgs: int) -> np.ndarray:
    """Static [TGS, TGS] visibility: same 2-D window (chunk columns are
    handled by the separate chunk branch and are always visible)."""
    t = np.arange(tgs)
    win = (t // (W * ws)) * (W // ws) + (t % W) // ws
    return win[:, None] == win[None, :]


def _strip_maps(W: int, ws: int, tgs: int,
                with_mask: bool = True) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(Rj, mask_add) for a row-major strip of ``tgs`` tokens.

    ``Rj [tgs, ws*ws]`` is the one-hot token -> Swin-local-coordinate
    matrix used to permute a per-window ``[S, S]`` bias into token
    coordinates via two tiny matmuls (:func:`_bias_to_token_coords`);
    ``mask_add [tgs, tgs]`` is the additive cross-window visibility mask
    (``None`` when ``with_mask=False`` — callers with their own mask skip
    the O(tgs^2) construction).  Cross-window entries of the permuted bias
    are wrong but carry MASK_VAL, so they never survive the softmax.
    """
    t = np.arange(tgs)
    loc = ((t // W) % ws) * ws + (t % W) % ws
    R = np.zeros((tgs, ws * ws), np.float32)
    R[np.arange(tgs), loc] = 1.0
    if not with_mask:
        return jnp.asarray(R), None
    vis = _rowmajor_vis(W, ws, tgs)
    mask_add = jnp.asarray(np.where(vis, 0.0, MASK_VAL), jnp.float32)
    return jnp.asarray(R), mask_add


def _bias_to_token_coords(bias: jax.Array, Rj: jax.Array) -> jax.Array:
    """Permute a Swin-local ``[H, S, S]`` bias into token coordinates."""
    return jnp.einsum("tl,hlm,um->htu", Rj, bias.astype(jnp.float32), Rj)


def _lane_pad(nh: int, d: int, proj: int) -> int:
    """Front-pad (in lanes) for the `[B, C, H*D]` summary operand so head
    ``h``'s slice lands at the same lane offset (mod 128) as the matching
    qkv section ``proj`` (1=k, 2=v): ``pad + h*d ≡ proj*nh*d + h*d``."""
    return (proj * nh * d) % 128


def _kernel_fused_out(qkv_ref, rf_ref, beta_ref, bias_ref, wo_ref, bo_ref,
                      o_ref, *, scale: float, nh: int, d: int, tgs: int,
                      c: int):
    """Forward with the OUTPUT PROJECTION fused: identical attention math to
    :func:`_kernel`, but the per-head outputs are concatenated in VMEM and
    multiplied by the resident ``W_out [H*D, H*D]`` (+bias) before the
    single strip write — the separate XLA projection's intermediate
    [B, N, H*D] read+write never touches HBM.  Eval-only (the training
    path keeps :func:`_kernel` + XLA projection so the registered VJP
    stays valid)."""
    pk, pv = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    outs = []
    for h in range(nh):
        qh = qkv_ref[:, 0, :, h * d:(h + 1) * d]
        kh = qkv_ref[:, 0, :, (nh + h) * d:(nh + h + 1) * d]
        vh = qkv_ref[:, 0, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
        rfh = rf_ref[:, :, pk + h * d:pk + (h + 1) * d]
        bth = beta_ref[:, :, pv + h * d:pv + (h + 1) * d]
        keys = jnp.concatenate([kh, rfh.astype(kh.dtype)], axis=1)
        vals = jnp.concatenate([vh, bth.astype(vh.dtype)], axis=1)
        logits = jax.lax.dot_general(
            qh, keys, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits + jnp.pad(bias_ref[h], ((0, 0), (0, c)))[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append((out / denom).astype(qkv_ref.dtype))
    attn = jnp.concatenate(outs, axis=-1)            # [RB, TGS, H*D]
    proj = jax.lax.dot_general(
        attn, wo_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[...]
    o_ref[:, 0, :, :] = proj.astype(o_ref.dtype)


def _kernel(qkv_ref, rf_ref, beta_ref, bias_ref, o_ref,
            *, scale: float, nh: int, d: int, tgs: int, c: int):
    """One grid step: RB batch rows x TGS tokens, all heads in lanes.

    Head extraction slices the *refs* (strided VMEM loads land at lane
    offset 0).  Local and chunk branches MERGE their key/value operands by
    a sublane concat (``keys [TGS+C, D]``), so each head runs one
    ``[TGS, D] x [D, TGS+C]`` dot — the separate C=49 chunk dot padded its
    lane dim 49 -> 128 (62% waste) where TGS+C pads 245 -> 256 (4%), and
    the value dot's contraction dim goes 196/49 -> 245 (~96% of two
    128-passes).  Measured 0.98 -> 0.76 ms at the bench geometry.  The
    concat is Mosaic-legal only at matching lane offsets, hence the
    :func:`_lane_pad` front-padding of the summaries (concatenating the
    LOGITS instead is not expressible — their offsets can't be aligned).
    """
    pk, pv = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    for h in range(nh):
        qh = qkv_ref[:, 0, :, h * d:(h + 1) * d]         # [RB, TGS, D]
        kh = qkv_ref[:, 0, :, (nh + h) * d:(nh + h + 1) * d]
        vh = qkv_ref[:, 0, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
        rfh = rf_ref[:, :, pk + h * d:pk + (h + 1) * d]  # [RB, C, D]
        bth = beta_ref[:, :, pv + h * d:pv + (h + 1) * d]
        keys = jnp.concatenate([kh, rfh.astype(kh.dtype)], axis=1)
        vals = jnp.concatenate([vh, bth.astype(vh.dtype)], axis=1)
        logits = jax.lax.dot_general(
            qh, keys, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                        # [RB, TGS, TGS+C]
        # bias/mask covers the local columns; chunk columns are always
        # visible (additive 0)
        logits = logits + jnp.pad(bias_ref[h], ((0, 0), (0, c)))[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, 0, :, h * d:(h + 1) * d] = \
            (out / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "nh", "W", "ws", "interpret"))
def _fwd(qkv, rf_p, beta_p, bias_big, scale, nh, W, ws, interpret=False):
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    C = rf_p.shape[1]
    RB, TGS = _pick_rows(B, N, W, ws, C)
    ns = N // TGS
    qkv4 = qkv.reshape(B, ns, TGS, three_hd)  # free: contiguous split
    grid = (B // RB, ns)
    qkv_spec = pl.BlockSpec((RB, 1, TGS, three_hd),
                            lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, TGS, TGS), lambda b, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RB, 1, TGS, nh * d), lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, scale=scale, nh=nh, d=d, tgs=TGS, c=C)
    # front-pad the summaries so each head's slice lane-aligns with its
    # k/v section (see _lane_pad/_kernel)
    pk, pv = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    rf_in = jnp.pad(rf_p, ((0, 0), (0, 0), (pk, 0))) if pk else rf_p
    bt_in = jnp.pad(beta_p, ((0, 0), (0, 0), (pv, 0))) if pv else beta_p
    rf_spec = pl.BlockSpec((RB, C, pk + nh * d), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bt_spec = pl.BlockSpec((RB, C, pv + nh * d), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qkv_spec, rf_spec, bt_spec, bias_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, ns, TGS, nh * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nh * N * (TGS + C) * d,
            bytes_accessed=qkv.size * 2 + B * N * nh * d * 2,
            transcendentals=B * nh * N * (TGS + C),
        ),
        interpret=interpret,
    )(qkv4, rf_in, bt_in, bias_big)
    return out.reshape(B, N, nh * d)


@functools.partial(
    jax.jit, static_argnames=("scale", "nh", "W", "ws", "interpret"))
def _fwd_fused_out(qkv, rf_p, beta_p, bias_big, wo, bo, scale, nh, W, ws,
                   interpret=False):
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    C = rf_p.shape[1]
    RB, TGS = _pick_rows(B, N, W, ws, C)
    ns = N // TGS
    qkv4 = qkv.reshape(B, ns, TGS, three_hd)
    grid = (B // RB, ns)
    qkv_spec = pl.BlockSpec((RB, 1, TGS, three_hd),
                            lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, TGS, TGS), lambda b, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RB, 1, TGS, nh * d), lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    wo_spec = pl.BlockSpec((nh * d, nh * d), lambda b, j: (0, 0),
                           memory_space=pltpu.VMEM)
    bo_spec = pl.BlockSpec((nh * d,), lambda b, j: (0,),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_fused_out, scale=scale, nh=nh, d=d,
                             tgs=TGS, c=C)
    pk, pv = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    rf_in = jnp.pad(rf_p, ((0, 0), (0, 0), (pk, 0))) if pk else rf_p
    bt_in = jnp.pad(beta_p, ((0, 0), (0, 0), (pv, 0))) if pv else beta_p
    rf_spec = pl.BlockSpec((RB, C, pk + nh * d), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bt_spec = pl.BlockSpec((RB, C, pv + nh * d), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qkv_spec, rf_spec, bt_spec, bias_spec, wo_spec, bo_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, ns, TGS, nh * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nh * N * (2 * (TGS + C) + nh * d) * d,
            bytes_accessed=qkv.size * 2 + B * N * nh * d * 2,
            transcendentals=B * nh * N * (TGS + C),
        ),
        interpret=interpret,
    )(qkv4, rf_in, bt_in, bias_big, wo, bo)
    return out.reshape(B, N, nh * d)


def eva_attention_packed_out(
    qkv: jax.Array,       # [B, N, 3*H*D] fused projection output
    rf_k_bar: jax.Array,  # [B, C, H*D]
    beta: jax.Array,      # [B, C, H*D]
    wo: jax.Array,        # [H*D, H*D] output-projection weight
    bo: jax.Array,        # [H*D]
    scale: float,
    num_heads: int,
    W: int,
    ws: int,
    bias: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Eval-only fused forward incl. output projection; ``[B, N, H*D]``.

    No VJP is registered — callers must gate on ``deterministic`` (the
    training path uses :func:`eva_attention_packed` + an XLA projection).
    """
    B, N, three_hd = qkv.shape
    nh = num_heads
    C = rf_k_bar.shape[1]
    _, TGS = _pick_rows(B, N, W, ws, C)
    Rj, mask_add = _strip_maps(W, ws, TGS)
    if bias is None:
        bias_big = jnp.broadcast_to(mask_add, (nh, TGS, TGS))
    else:
        bias_big = _bias_to_token_coords(bias, Rj) + mask_add
    return _fwd_fused_out(qkv, rf_k_bar, beta, bias_big,
                          wo.astype(qkv.dtype), bo.astype(jnp.float32),
                          float(scale), nh, W, ws, interpret=interpret)


def _bwd_kernel(qkv_ref, rf_ref, beta_ref, bias_ref, g_ref,
                dqkv_ref, drf_ref, dbeta_ref, dbias_ref,
                *, scale: float, nh: int, d: int, tgs: int, c: int):
    """Fused backward: one grid step recomputes its strip's joint softmax in
    VMEM (flash-style) and emits dq/dk/dv in place plus drf/dbeta/dbias
    accumulated across sequential grid steps (revisited output blocks
    persist in VMEM under 'arbitrary' dimension semantics on the window
    axis).  ``dbias`` is emitted as PER-BATCH-GROUP partials (summed by
    the caller) so nothing accumulates across batch groups and the batch
    grid axis stays 'parallel' — the all-'arbitrary' v1 serialized every
    grid step (measured on the causal twin: backward 2.4x the forward)."""
    j_idx = pl.program_id(1)

    @pl.when(j_idx == 0)
    def _init_cd():
        drf_ref[...] = jnp.zeros_like(drf_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    pk, pv = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    for h in range(nh):
        qh = qkv_ref[:, 0, :, h * d:(h + 1) * d]          # [RB, TGS, D]
        kh = qkv_ref[:, 0, :, (nh + h) * d:(nh + h + 1) * d]
        vh = qkv_ref[:, 0, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
        rfh = rf_ref[:, :, pk + h * d:pk + (h + 1) * d]   # [RB, C, D]
        bth = beta_ref[:, :, pv + h * d:pv + (h + 1) * d]
        gh = g_ref[:, 0, :, h * d:(h + 1) * d]            # [RB, TGS, D]

        # merged-operand recompute (same trick as the forward _kernel):
        # one [TGS, D] x [D, TGS+C] logits dot, one joint softmax, one
        # joint dP dot, one joint dq dot; only the transposed reductions
        # (dk/dv vs drf/dbeta) need the lane-sliced halves
        keys = jnp.concatenate([kh, rfh.astype(kh.dtype)], axis=1)
        vals = jnp.concatenate([vh, bth.astype(vh.dtype)], axis=1)
        logits = jax.lax.dot_general(
            qh, keys, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits + jnp.pad(bias_ref[h], ((0, 0), (0, c)))[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        P = p / denom                                     # [RB, TGS, TGS+C]

        dP = jax.lax.dot_general(                         # g @ vals^T
            gh, vals, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = jnp.sum(P * dP, axis=-1, keepdims=True)
        dSf = P * (dP - ds)                               # f32
        dS = dSf.astype(qh.dtype)

        dq = scale * jax.lax.dot_general(
            dS, keys, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dS_l, dS_c = dS[:, :, :tgs], dS[:, :, tgs:]
        dk = scale * jax.lax.dot_general(                 # dS_l^T @ q
            dS_l, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        P_l = P[:, :, :tgs].astype(gh.dtype)
        P_c = P[:, :, tgs:].astype(gh.dtype)
        dv = jax.lax.dot_general(                         # P_l^T @ g
            P_l, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        dqkv_ref[:, 0, :, h * d:(h + 1) * d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, 0, :, (nh + h) * d:(nh + h + 1) * d] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, 0, :, (2 * nh + h) * d:(2 * nh + h + 1) * d] = \
            dv.astype(dqkv_ref.dtype)

        drf_part = scale * jax.lax.dot_general(           # dS_c^T @ q
            dS_c, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [RB, C, D]
        dbt_part = jax.lax.dot_general(                   # P_c^T @ g
            P_c, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        drf_ref[:, :, h * d:(h + 1) * d] += drf_part
        dbeta_ref[:, :, h * d:(h + 1) * d] += dbt_part
        dbias_ref[0, h, :, :] += jnp.sum(dSf[:, :, :tgs], axis=0)


@functools.partial(
    jax.jit, static_argnames=("scale", "nh", "W", "ws", "interpret"))
def _bwd_fused(qkv, rf_p, beta_p, bias_big, g, scale, nh, W, ws,
               interpret=False):
    """Pallas backward; returns (dqkv, drf_p, dbeta_p, dbias_big)."""
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    C = rf_p.shape[1]
    RB, TGS = _pick_rows(B, N, W, ws, C)
    # the backward keeps ~3x the forward's fp32 [RB, TGS, TGS+C] values
    # live (P, dP, dS) plus in/out token blocks and the f32 drf/dbeta
    # accumulators; ~36MB budget under the 100MB scoped limit (the old
    # 1.1MB logits-only cap shrank RB to 4 at the bench geometry and,
    # with the all-'arbitrary' semantics, serialized 128 grid steps)
    hd3 = three_hd
    isz = qkv.dtype.itemsize
    while RB > 1 and (3 * RB * TGS * (TGS + max(C, 128)) * 4
                      + 2 * RB * TGS * hd3 * isz
                      + RB * TGS * (hd3 // 3) * isz
                      + 4 * RB * C * (hd3 // 3) * (isz + 4)) > BWD_BUDGET:
        RB //= 2
    ns = N // TGS
    qkv4 = qkv.reshape(B, ns, TGS, three_hd)
    g4 = g.reshape(B, ns, TGS, nh * d)
    grid = (B // RB, ns)
    qkv_spec = pl.BlockSpec((RB, 1, TGS, three_hd),
                            lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((RB, 1, TGS, nh * d), lambda b, j: (b, j, 0, 0),
                          memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((RB, C, nh * d), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, TGS, TGS), lambda b, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    # lane-align the summary inputs for the merged-operand recompute (the
    # drf/dbeta OUTPUTS stay unpadded)
    pk, pv = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    rf_in = jnp.pad(rf_p, ((0, 0), (0, 0), (pk, 0))) if pk else rf_p
    bt_in = jnp.pad(beta_p, ((0, 0), (0, 0), (pv, 0))) if pv else beta_p
    rf_spec = pl.BlockSpec((RB, C, pk + nh * d), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bt_spec = pl.BlockSpec((RB, C, pv + nh * d), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    dbias_spec = pl.BlockSpec((1, nh, TGS, TGS), lambda b, j: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, scale=scale, nh=nh, d=d, tgs=TGS,
                             c=C)
    dqkv, drf, dbeta, dbias = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qkv_spec, rf_spec, bt_spec, bias_spec, g_spec],
        out_specs=[qkv_spec, cd_spec, cd_spec, dbias_spec],
        out_shape=[
            jax.ShapeDtypeStruct(qkv4.shape, qkv.dtype),
            jax.ShapeDtypeStruct((B, C, nh * d), jnp.float32),
            jax.ShapeDtypeStruct((B, C, nh * d), jnp.float32),
            jax.ShapeDtypeStruct((B // RB, nh, TGS, TGS), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv4, rf_in, bt_in, bias_big, g4)
    return (dqkv.reshape(B, N, three_hd), drf.astype(rf_p.dtype),
            dbeta.astype(beta_p.dtype), jnp.sum(dbias, axis=0))


def _xla_rowmajor(qkv, rf_p, beta_p, scale, nh, W, ws, bias):
    """Row-major-strip joint softmax on the packed layout (test oracle
    only; the registered VJP is the fused Pallas :func:`_bwd_fused`).

    Mirrors the kernel's own strip structure: the token axis splits into
    [ns, TGS] by a FREE reshape, cross-window visibility is the static
    additive mask, and the per-window bias is pre-permuted with the same
    tiny permutation matmuls as the forward.  No transpose of a full tensor
    appears in either direction (the Swin-partition formulation costs ~6
    full-tensor transposed copies per layer in fwd+bwd of the VJP), at the
    price of the strips' masked dense waste — which is cheap MXU work.
    """
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    C = rf_p.shape[1]
    TGS = W * ws
    ns = N // TGS
    qkv6 = qkv.reshape(B, ns, TGS, 3, nh, d)
    q, k, v = qkv6[:, :, :, 0], qkv6[:, :, :, 1], qkv6[:, :, :, 2]
    rf = rf_p.reshape(B, C, nh, d)
    bt = beta_p.reshape(B, C, nh, d)
    Rj, mask_add = _strip_maps(W, ws, TGS)
    local = jnp.einsum("bsihd,bsjhd->bshij", q, k,
                       preferred_element_type=jnp.float32) * scale
    if bias is not None:
        local = local + _bias_to_token_coords(bias, Rj)[None, None]
    local = local + mask_add[None, None, None]
    chunk = jnp.einsum("bsihd,bchd->bshic", q, rf,
                       preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk], axis=-1), axis=-1).astype(v.dtype)
    out = (jnp.einsum("bshij,bsjhd->bsihd", attn[..., :TGS], v)
           + jnp.einsum("bshic,bchd->bsihd", attn[..., TGS:], bt))
    return out.reshape(B, N, nh * d)


def _xla_windowed(qkv, rf_p, beta_p, scale, nh, W, ws, bias):
    """Windowed O(N*(S+C)) joint softmax on the packed layout.  Same math
    as :func:`_xla_reference` but via the Swin window partition, so it
    never materializes the [B, H, N, N] dense logit tensor (944MB/layer at
    the DeiT-tiny-p8 bench geometry)."""
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    C = rf_p.shape[1]
    gh, gw = N // W, W
    hw, ww = gh // ws, gw // ws
    S = ws * ws
    G = hw * ww
    qkv6 = qkv.reshape(B, hw, ws, ww, ws, 3, nh, d)
    # [B, G, S, 3, nh, d]
    win = jnp.transpose(qkv6, (0, 1, 3, 2, 4, 5, 6, 7)).reshape(
        B, G, S, 3, nh, d)
    q, k, v = win[:, :, :, 0], win[:, :, :, 1], win[:, :, :, 2]
    rf = rf_p.reshape(B, C, nh, d)
    bt = beta_p.reshape(B, C, nh, d)
    local = jnp.einsum("bgihd,bgjhd->bghij", q, k,
                       preferred_element_type=jnp.float32) * scale
    if bias is not None:
        local = local + bias.astype(local.dtype)[None, None]
    chunk = jnp.einsum("bgihd,bchd->bghic", q, rf,
                       preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk], axis=-1), axis=-1).astype(v.dtype)
    out = (jnp.einsum("bghij,bgjhd->bgihd", attn[..., :S], v)
           + jnp.einsum("bghic,bchd->bgihd", attn[..., S:], bt))
    out = out.reshape(B, hw, ww, ws, ws, nh, d)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5, 6)).reshape(B, N, nh * d)
    return out


def _xla_reference(qkv, rf_p, beta_p, scale, nh, W, ws, bias):
    """Dense ground-truth joint softmax on the packed layout (test oracle
    only; the registered VJP is the fused Pallas :func:`_bwd_fused`)."""
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    C = rf_p.shape[1]
    q, k, v = (qkv.reshape(B, N, 3, nh, d)[:, :, i] for i in range(3))
    rf = rf_p.reshape(B, C, nh, d)
    bt = beta_p.reshape(B, C, nh, d)
    t = np.arange(N)
    win = (t // (W * ws)) * (W // ws) + (t % W) // ws
    same = jnp.asarray(win[:, None] == win[None, :])
    local = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
    if bias is not None:
        # bias [H, S, S] in Swin-local coords; permute to token coords
        Rj, _ = _strip_maps(W, ws, N, with_mask=False)
        local = local + _bias_to_token_coords(bias, Rj)[None]
    local = jnp.where(same[None, None], local, MASK_VAL)
    chunk = jnp.einsum("bnhd,bchd->bhnc", q, rf,
                       preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk], axis=-1), axis=-1).astype(v.dtype)
    out = (jnp.einsum("bhnm,bmhd->bnhd", attn[..., :N], v)
           + jnp.einsum("bhnc,bchd->bnhd", attn[..., N:], bt))
    return out.reshape(B, N, nh * d)


@functools.lru_cache(maxsize=None)
def _make_differentiable(scale, nh, W, ws, has_bias, interpret):
    @jax.custom_vjp
    def f(qkv, rf_p, beta_p, bias_big, bias):
        return _fwd(qkv, rf_p, beta_p, bias_big, scale, nh, W, ws,
                    interpret=interpret)

    def fwd(qkv, rf_p, beta_p, bias_big, bias):
        return f(qkv, rf_p, beta_p, bias_big, bias), (
            qkv, rf_p, beta_p, bias)

    def bwd(res, g):
        qkv, rf_p, beta_p, bias = res
        tgs = _pick_rows(qkv.shape[0], qkv.shape[1], W, ws,
                         rf_p.shape[1])[1]
        # rebuild the resident additive table (cheap: tiny perm matmuls)
        Rj, mask_add = _strip_maps(W, ws, tgs)
        if has_bias:
            big = _bias_to_token_coords(bias, Rj) + mask_add
        else:
            big = jnp.broadcast_to(mask_add, (nh, tgs, tgs))
        dqkv, drf, dbeta, dbig = _bwd_fused(
            qkv, rf_p, beta_p, big, g, scale, nh, W, ws,
            interpret=interpret)
        if has_bias:
            # bias_big = R bias R^T (+ mask): pull the table gradient back
            # through the permutation matmuls
            dbias = jnp.einsum("tl,htu,um->hlm", Rj, dbig, Rj)
        else:
            dbias = jnp.zeros_like(bias)
        # the bias_big INPUT's cotangent is zero — the gradient flows via
        # the `bias` slot above (bias_big is derived outside the boundary)
        zeros_big = jnp.zeros((nh, tgs, tgs), jnp.float32)
        return dqkv, drf, dbeta, zeros_big, dbias.astype(bias.dtype)

    f.defvjp(fwd, bwd)
    return f


def eva_attention_packed(
    qkv: jax.Array,       # [B, N, 3*H*D] fused projection output
    rf_k_bar: jax.Array,  # [B, C, H*D]
    beta: jax.Array,      # [B, C, H*D]
    scale: float,
    num_heads: int,
    W: int,               # token-grid width
    ws: int,              # window side
    bias: Optional[jax.Array] = None,  # [H, S, S] Swin-local RPE bias
    interpret: bool = False,
) -> jax.Array:
    """Zero-transpose fused EVA attention; returns ``[B, N, H*D]``."""
    B, N, three_hd = qkv.shape
    nh = num_heads
    d = three_hd // (3 * nh)
    C = rf_k_bar.shape[1]
    _, TGS = _pick_rows(B, N, W, ws, C)

    Rj, mask_add = _strip_maps(W, ws, TGS)
    if bias is None:
        bias_big = jnp.broadcast_to(mask_add, (nh, TGS, TGS))
        bias_in = jnp.zeros((nh, ws * ws, ws * ws), jnp.float32)
    else:
        bias_big = _bias_to_token_coords(bias, Rj) + mask_add
        bias_in = bias
    f = _make_differentiable(float(scale), nh, W, ws, bias is not None,
                             interpret)
    return f(qkv, rf_k_bar, beta, bias_big, bias_in)
