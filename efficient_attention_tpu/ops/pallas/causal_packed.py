"""Packed fused kernel for causal EVA's parallel (training/scoring) path.

The 1-D causal analogue of ``eva_packed.py``, targeting the LM vertical
(reference hot path ``causal_eva.py:666-788``).  The XLA path materializes
the chunk control-variate logits ``[B, H, G, i, C]`` in HBM — 537 MB/layer
at the wikitext bench geometry (B4 H8 T2048 window128 chunk8, C=256) — plus
the joint softmax over ``[i, window + C]``; this kernel streams both
through VMEM strip by strip.

Design (shared with the 2-D kernel, see ``eva_packed.py``):
  * packed layout: q/k/v arrive as ``[B, T, H*D]`` (separate projections,
    fairseq-style) and chunk summaries as ``[B, C, H*D]``; heads are
    in-kernel lane slices.  Separate q/k/v arrays mean the summary slices
    are lane-aligned with k/v automatically (both ``h*d`` offsets), so the
    merged-operand sublane concat needs no padding here.
  * one grid step = one causal window of ``w`` tokens; its local causal
    mask + T5 bias live in one resident additive ``[w, w]`` table
    (head-shared — the reference's T5-RPE uses a single shared head,
    ``causal_eva.py:47-97``), and the chunk-causality mask (query at
    global position p sees chunk c iff ``c < p // chunk_size``) is two
    iota compares computed per step.
  * merged operands: ``keys = [k | rf_k_bar]``, ``vals = [v | beta]`` as
    ``[w + C, D]`` sublane concats -> ONE ``[w, D] x [D, w + C]`` logits
    dot, one joint softmax, one output dot per head.

Constraints for engagement (else the XLA path runs): no overlap halo
(``ext_size == 0``), ``window % chunk_size == 0``, sequence a multiple of
the window, no key-padding mask, and zero attention dropout (the reference
drops attention probabilities; a Pallas-PRNG in-kernel dropout is future
work — training recipes with attn dropout fall back to XLA).
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

# Backward-pass VMEM budget (bytes).  Module-level so the RB race in
# scripts/bench_causal_bwd.py can sweep it; 36MB measured best at the
# T=512 recipe shape (RB=8) under the 100MB scoped limit.
BWD_BUDGET = 36_000_000


def _fwd_bytes(rb: int, w: int, c: int, hd: int, itemsize: int) -> int:
    """Per-step VMEM estimate: fp32 logits/probs + the summary blocks
    (C = T/chunk_size GROWS with sequence length, unlike eva_packed's fixed
    num_landmarks — they must be budgeted) + q/k/v/out token blocks, all at
    the input dtype's ``itemsize``."""
    cols = w + max(c, 128)
    return (rb * w * cols * 4             # fp32 logits (P reuses the buffer)
            + 2 * rb * c * hd * itemsize  # rf_k_bar + beta blocks
            + 4 * rb * w * hd * itemsize)  # q/k/v/out blocks


def _pick_rows(b: int, t: int, w: int, c: int, hd: int,
               itemsize: int = 2) -> Optional[int]:
    """Batch rows per grid step under the scoped-VMEM budget (~16MB cap;
    12MB here leaves headroom for Mosaic temporaries)."""
    if w <= 0 or t % w != 0:
        return None
    for rb in (16, 8, 4, 2, 1):
        # the raised vmem_limit_bytes (100MB, matching eva_packed) admits
        # RB=16; 24MB keeps ~4x headroom under it for Mosaic temporaries
        if b % rb == 0 and _fwd_bytes(rb, w, c, hd, itemsize) <= 24_000_000:
            return rb
    return None


def supports_causal_packed(b: int, t: int, w: int, cs: int, hd: int,
                           itemsize: int = 2) -> bool:
    """Geometry gate: windows tile the sequence, chunks tile windows, and
    the summary/logits blocks fit VMEM at some RB.  ``hd`` is the packed
    hidden size (num_heads * head_dim) and ``itemsize`` the input dtype's
    byte width — both change the verdict, so callers must pass them."""
    return (w > 0 and cs > 0 and w % cs == 0 and t % w == 0
            and _pick_rows(b, t, w, (t // cs), hd, itemsize) is not None)


def _joint_add(bias_ref, g, w: int, cs: int, c: int):
    """Additive table over the joint width [w, w + c]: the resident local
    bias+causal-mask table right-padded with zeros for the chunk columns,
    then the chunk-causality mask (query at global position p sees chunk
    j - w iff it is strictly before p // cs, i.e. before chunk index
    g*(w//cs) + i//cs) applied via two iota compares."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (w, w + c), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (w, w + c), 1)
    chunk_blocked = (jj >= w) & (
        (jj - w) >= g * (w // cs) + ii // cs)
    add = jnp.pad(bias_ref[...], ((0, 0), (0, c)))
    return jnp.where(chunk_blocked, MASK_VAL, add)


def _joint_P(qh, keys, add, scale):
    """Merged-operand joint softmax probabilities [RB, w, w+c] (f32).

    The logits round-trip through the compute dtype before the softmax so
    the packed path quantizes identically to the XLA parallel path (which
    casts its logits to q.dtype, ``causal_eva.py``) — keeps bf16
    full-vs-incremental agreement at the same rounding the XLA path has.
    """
    logits = jax.lax.dot_general(
        qh, keys, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    logits = (logits.astype(qh.dtype).astype(jnp.float32) + add[None])
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _kernel(q_ref, k_ref, v_ref, rf_ref, beta_ref, bias_ref, o_ref,
            *, scale: float, nh: int, d: int, w: int, cs: int, c: int):
    add = _joint_add(bias_ref, pl.program_id(1), w, cs, c)
    for h in range(nh):
        qh = q_ref[:, 0, :, h * d:(h + 1) * d]          # [RB, w, D]
        kh = k_ref[:, 0, :, h * d:(h + 1) * d]
        vh = v_ref[:, 0, :, h * d:(h + 1) * d]
        rfh = rf_ref[:, :, h * d:(h + 1) * d]           # [RB, C, D]
        bth = beta_ref[:, :, h * d:(h + 1) * d]
        keys = jnp.concatenate([kh, rfh.astype(kh.dtype)], axis=1)
        vals = jnp.concatenate([vh, bth.astype(vh.dtype)], axis=1)
        P = _joint_P(qh, keys, add, scale)
        out = jax.lax.dot_general(
            P.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, 0, :, h * d:(h + 1) * d] = out.astype(o_ref.dtype)


def _specs(RB, w, C, hd, nh):
    tok = pl.BlockSpec((RB, 1, w, hd), lambda b, j: (b, j, 0, 0),
                       memory_space=pltpu.VMEM)
    cd = pl.BlockSpec((RB, C, hd), lambda b, j: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((w, w), lambda b, j: (0, 0),
                        memory_space=pltpu.VMEM)
    return tok, cd, bias


@functools.partial(
    jax.jit, static_argnames=("scale", "nh", "w", "cs", "interpret"))
def _fwd(q, k, v, rf_p, beta_p, bias_tab, scale, nh, w, cs,
         interpret=False):
    B, T, hd = q.shape
    d = hd // nh
    C = rf_p.shape[1]
    RB = _pick_rows(B, T, w, C, hd, q.dtype.itemsize)
    if RB is None:
        raise ValueError(
            f"causal_eva_packed: unsupported geometry (T={T}, window={w}, "
            f"C={C}, hd={hd}) — check supports_causal_packed first")
    ns = T // w
    q4 = q.reshape(B, ns, w, hd)
    k4 = k.reshape(B, ns, w, hd)
    v4 = v.reshape(B, ns, w, hd)
    tok, cd, bias = _specs(RB, w, C, hd, nh)
    kern = functools.partial(_kernel, scale=scale, nh=nh, d=d, w=w, cs=cs,
                             c=C)
    out = pl.pallas_call(
        kern,
        grid=(B // RB, ns),
        in_specs=[tok, tok, tok, cd, cd, bias],
        out_specs=tok,
        out_shape=jax.ShapeDtypeStruct((B, ns, w, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nh * T * (w + C) * d,
            # each b-group fetches its [RB, C, hd] summary slice once and
            # keeps it resident across the window steps
            bytes_accessed=(q.nbytes + k.nbytes + v.nbytes + q.nbytes
                            + rf_p.nbytes + beta_p.nbytes
                            + bias_tab.nbytes),
            transcendentals=B * nh * T * (w + C),
        ),
        interpret=interpret,
    )(q4, k4, v4, rf_p, beta_p, bias_tab)
    return out.reshape(B, T, hd)


def _bwd_kernel(q_ref, k_ref, v_ref, rf_ref, beta_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, drf_ref, dbeta_ref, dbias_ref,
                *, scale: float, nh: int, d: int, w: int, cs: int, c: int):
    """Fused backward: joint-softmax recompute per strip (flash-style),
    accumulating drf/dbeta across sequential window steps (revisited output
    blocks persist in VMEM under 'arbitrary' semantics on the window axis).
    ``dbias`` is emitted as PER-BATCH-GROUP partials (summed by the caller)
    so nothing accumulates across batch groups and the batch grid axis
    stays 'parallel' — the all-'arbitrary' v1 serialized every grid step
    and measured 2.4x slower than the forward at the T=512 recipe shape."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init_cd():
        drf_ref[...] = jnp.zeros_like(drf_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    add = _joint_add(bias_ref, g, w, cs, c)
    for h in range(nh):
        qh = q_ref[:, 0, :, h * d:(h + 1) * d]
        kh = k_ref[:, 0, :, h * d:(h + 1) * d]
        vh = v_ref[:, 0, :, h * d:(h + 1) * d]
        rfh = rf_ref[:, :, h * d:(h + 1) * d]
        bth = beta_ref[:, :, h * d:(h + 1) * d]
        gh = g_ref[:, 0, :, h * d:(h + 1) * d]

        keys = jnp.concatenate([kh, rfh.astype(kh.dtype)], axis=1)
        vals = jnp.concatenate([vh, bth.astype(vh.dtype)], axis=1)
        P = _joint_P(qh, keys, add, scale)

        dP = jax.lax.dot_general(
            gh, vals, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = jnp.sum(P * dP, axis=-1, keepdims=True)
        dSf = P * (dP - ds)
        dS = dSf.astype(qh.dtype)

        dq = scale * jax.lax.dot_general(
            dS, keys, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dS_l, dS_c = dS[:, :, :w], dS[:, :, w:]
        dk = scale * jax.lax.dot_general(
            dS_l, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        P_l = P[:, :, :w].astype(gh.dtype)
        P_c = P[:, :, w:].astype(gh.dtype)
        dv = jax.lax.dot_general(
            P_l, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        dq_ref[:, 0, :, h * d:(h + 1) * d] = dq.astype(dq_ref.dtype)
        dk_ref[:, 0, :, h * d:(h + 1) * d] = dk.astype(dk_ref.dtype)
        dv_ref[:, 0, :, h * d:(h + 1) * d] = dv.astype(dv_ref.dtype)

        drf_part = scale * jax.lax.dot_general(
            dS_c, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dbt_part = jax.lax.dot_general(
            P_c, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        drf_ref[:, :, h * d:(h + 1) * d] += drf_part
        dbeta_ref[:, :, h * d:(h + 1) * d] += dbt_part
        dbias_ref[0] += jnp.sum(dSf[:, :, :w], axis=0)


@functools.partial(
    jax.jit, static_argnames=("scale", "nh", "w", "cs", "interpret"))
def _bwd_fused(q, k, v, rf_p, beta_p, bias_tab, g, scale, nh, w, cs,
               interpret=False):
    B, T, hd = q.shape
    d = hd // nh
    C = rf_p.shape[1]
    isz = q.dtype.itemsize
    RB = _pick_rows(B, T, w, C, hd, isz)
    if RB is None:
        raise ValueError(
            f"causal_eva_packed backward: unsupported geometry (T={T}, "
            f"window={w}, C={C}, hd={hd})")
    # the backward keeps ~3x more fp32 [RB, w, w+C] values live (P, dP,
    # dS), SEVEN token blocks (q/k/v/g in, dq/dk/dv out) and the f32
    # drf/dbeta accumulator outputs; ~36MB budget under the 100MB scoped
    # limit (measured: the old 9MB cap shrank RB to 2 at the T=512 recipe
    # shape and the backward ran 2.4x slower than the forward)
    while RB > 1 and (3 * RB * w * (w + max(C, 128)) * 4
                      + 2 * RB * C * hd * (isz + 4)
                      + 7 * RB * w * hd * isz) > BWD_BUDGET:
        RB //= 2
    ns = T // w
    q4, k4, v4 = (t.reshape(B, ns, w, hd) for t in (q, k, v))
    g4 = g.reshape(B, ns, w, hd)
    tok, cd, bias = _specs(RB, w, C, hd, nh)
    dbias_spec = pl.BlockSpec((1, w, w), lambda b, j: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, scale=scale, nh=nh, d=d, w=w,
                             cs=cs, c=C)
    dq, dk, dv, drf, dbeta, dbias = pl.pallas_call(
        kern,
        grid=(B // RB, ns),
        in_specs=[tok, tok, tok, cd, cd, bias, tok],
        out_specs=[tok, tok, tok, cd, cd, dbias_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, ns, w, hd), q.dtype),
            jax.ShapeDtypeStruct((B, ns, w, hd), q.dtype),
            jax.ShapeDtypeStruct((B, ns, w, hd), q.dtype),
            jax.ShapeDtypeStruct((B, C, hd), jnp.float32),
            jax.ShapeDtypeStruct((B, C, hd), jnp.float32),
            jax.ShapeDtypeStruct((B // RB, w, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q4, k4, v4, rf_p, beta_p, bias_tab, g4)
    return (dq.reshape(B, T, hd), dk.reshape(B, T, hd),
            dv.reshape(B, T, hd), drf.astype(rf_p.dtype),
            dbeta.astype(beta_p.dtype), jnp.sum(dbias, axis=0))


def _xla_reference(q, k, v, rf_p, beta_p, bias_tab, scale, nh, w, cs):
    """Strip-form XLA joint softmax on the packed layout (test oracle)."""
    B, T, hd = q.shape
    d = hd // nh
    C = rf_p.shape[1]
    ns = T // w
    qs = q.reshape(B, ns, w, nh, d)
    ks = k.reshape(B, ns, w, nh, d)
    vs = v.reshape(B, ns, w, nh, d)
    rf = rf_p.reshape(B, C, nh, d)
    bt = beta_p.reshape(B, C, nh, d)
    local = jnp.einsum("bgihd,bgjhd->bghij", qs, ks,
                       preferred_element_type=jnp.float32) * scale
    local = local + bias_tab[None, None, None].astype(jnp.float32)
    chunk = jnp.einsum("bgihd,bchd->bghic", qs, rf,
                       preferred_element_type=jnp.float32) * scale
    pos = np.arange(T).reshape(ns, w)
    blocked = np.arange(C)[None, None, :] >= (pos // cs)[:, :, None]
    chunk = jnp.where(jnp.asarray(blocked)[:, None], MASK_VAL, chunk)
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk], axis=-1), axis=-1).astype(vs.dtype)
    out = (jnp.einsum("bghij,bgjhd->bgihd", attn[..., :w], vs)
           + jnp.einsum("bghic,bchd->bgihd", attn[..., w:], bt))
    return out.reshape(B, T, hd)


@functools.lru_cache(maxsize=None)
def _make_differentiable(scale, nh, w, cs, interpret):
    @jax.custom_vjp
    def f(q, k, v, rf_p, beta_p, bias_tab):
        return _fwd(q, k, v, rf_p, beta_p, bias_tab, scale, nh, w, cs,
                    interpret=interpret)

    def fwd(q, k, v, rf_p, beta_p, bias_tab):
        return f(q, k, v, rf_p, beta_p, bias_tab), (
            q, k, v, rf_p, beta_p, bias_tab)

    def bwd(res, g):
        q, k, v, rf_p, beta_p, bias_tab = res
        dq, dk, dv, drf, dbeta, dbias = _bwd_fused(
            q, k, v, rf_p, beta_p, bias_tab, g, scale, nh, w, cs,
            interpret=interpret)
        return dq, dk, dv, drf, dbeta, dbias.astype(bias_tab.dtype)

    f.defvjp(fwd, bwd)
    return f


def causal_eva_packed(
    q: jax.Array,         # [B, T, H*D]
    k: jax.Array,
    v: jax.Array,
    rf_k_bar: jax.Array,  # [B, C, H*D]
    beta: jax.Array,      # [B, C, H*D]
    scale: float,
    num_heads: int,
    window: int,
    chunk: int,
    bias_tab: Optional[jax.Array] = None,  # [w, w] additive (bias + mask)
    interpret: bool = False,
) -> jax.Array:
    """Fused causal-EVA parallel attention; returns ``[B, T, H*D]``.

    ``bias_tab`` must already FOLD the local causal mask (triu(1) ->
    MASK_VAL) and any T5-RPE bias; chunk causality is derived in-kernel.
    Differentiable w.r.t. every operand including ``bias_tab`` (the T5
    bucket gather that builds it runs outside and autodiffs through).
    """
    if bias_tab is None:
        tri = np.triu(np.ones((window, window), np.float32), 1) * MASK_VAL
        bias_tab = jnp.asarray(tri)
    f = _make_differentiable(float(scale), num_heads, window, chunk,
                             interpret)
    return f(q, k, v, rf_k_bar, beta, bias_tab)
