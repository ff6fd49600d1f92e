"""Megakernel EVA eval path: both kernels consume x, not qkv.

Round-3 measurement story (scripts/bench_eva_eval_paths.py,
bench_summaries_probe*.py): at the bench geometry the module spends most of
its non-attention time moving the 3x-width ``qkv`` tensor through HBM —
the XLA projection writes 115MB, the summaries re-read 115MB, and the
attention kernel reads 115MB again (~345MB beyond the x-read/out-write
floor).  Pallas reads on this chip stream at only ~¼ of copy bandwidth, so
shrinking BYTES READ beats shrinking work: these kernels read the 38.5MB
``x`` instead and recompute the projection on the MXU per strip (the whole
qkv projection is 22 GFLOP ≈ 0.11 ms — cheaper than the traffic it
replaces).

  * :func:`eva_summaries_from_x` — chunk summaries with the qkv projection
    inlined (body shared with ``eva_summaries.py``).
  * :func:`eva_attention_from_x` — the packed joint-softmax attention
    (``eva_packed.py`` semantics) with the qkv projection computed into a
    VMEM scratch and the output projection fused.

Both are EVAL-ONLY (no VJP): training keeps the XLA formulations whose
gradients are plain matmuls.  Reference semantics:
``efficient-attention/efficient_attention/eva.py:178-233``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficient_attention_tpu.ops.pallas.eva_packed import (
    _bias_to_token_coords,
    _pick_rows,
    _strip_maps,
)
# ------------------------------------------------------------- summaries --


def _sum_kernel(x_ref, wqkv_ref, bqkv_ref,
                wq_ref, bq_ref, wk_ref, bk_ref,
                lnq_s_ref, lnq_b_ref, lnk_s_ref, lnk_b_ref,
                rf_ref, beta_ref,
                *, nh: int, d: int, j: int, gw: int, wc: int, sgs: int,
                rb: int, use_ln: bool):
    """Chunk summaries with the qkv projection inlined: one [SGS, D] x
    [D, 3HD] dot per strip, then the lane-wide summary body of
    ``eva_summaries._kernel`` (bf16 fast path)."""
    hd = nh * d
    ct = x_ref.dtype

    def dot(a, b, dims, cast=True):
        t = ct if cast else jnp.float32
        return jax.lax.dot_general(a.astype(t), b.astype(t), dims,
                                   preferred_element_type=jnp.float32)

    strip = (jax.lax.dot_general(
        x_ref[:, 0], wqkv_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[...]).astype(ct)

    n_idx = jax.lax.broadcasted_iota(jnp.int32, (wc, sgs), 1)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (wc, sgs), 0)
    P = ((n_idx % gw) // j == c_idx).astype(jnp.float32)
    Pb = jnp.broadcast_to(P[None], (rb, wc, sgs))
    Pmb = Pb / float(j * j)
    PbT = jnp.broadcast_to(P.T[None], (rb, sgs, wc))
    f_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * hd, nh), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * hd, nh), 1)
    sec = f_idx // hd
    head_of = (f_idx % hd) // d
    S_k = ((sec == 1) & (head_of == h_idx)).astype(jnp.float32)
    S_v = ((sec == 2) & (head_of == h_idx)).astype(jnp.float32)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1)
    M_avg = (a_idx // d == b_idx // d).astype(jnp.float32) / float(d)
    bdims = (((2,), (1,)), ((0,), (0,)))

    def ln(x, scale, bias, eps=1e-6):
        mean = dot(x, M_avg, (((2,), (0,)), ((), ())), cast=False)
        m2 = dot(x * x, M_avg, (((2,), (0,)), ((), ())), cast=False)
        var = m2 - mean * mean
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias

    dn = d ** -0.5
    means = dot(Pmb, strip, bdims)
    rf_k = dot(means, wk_ref[...], (((2,), (0,)), ((), ())),
               cast=False) + bk_ref[...]
    rf_q = dot(means, wq_ref[...], (((2,), (0,)), ((), ())),
               cast=False) + bq_ref[...]
    if use_ln:
        rf_k = ln(rf_k, lnk_s_ref[...], lnk_b_ref[...])
        rf_q = ln(rf_q, lnq_s_ref[...], lnq_b_ref[...])
    mu = 0.5 * (rf_q + rf_k)
    w_tok = dot(PbT, mu, bdims, cast=False)
    w_full = jnp.pad(w_tok.astype(ct), ((0, 0), (0, 0), (hd, hd)))
    dash = dn * dot(strip * w_full, S_k, (((2,), (0,)), ((), ())))
    norm = (0.5 * dn) * dot(strip * strip, S_k, (((2,), (0,)), ((), ())))
    logp = dash - norm
    lp_c = jnp.where(Pb[..., None] > 0, logp[:, None], jnp.float32(-1e30))
    m = jnp.max(lp_c, axis=2)
    m_tok = dot(PbT, m, bdims, cast=False)
    p = jnp.exp(logp - m_tok)
    denom = dot(Pb, p, bdims, cast=False)
    p_lanes = dot(p, S_v, (((2,), (1,)), ((), ())), cast=False)
    pv = dot(Pb, strip * p_lanes.astype(ct), bdims)
    denom_lanes = dot(denom, S_v[2 * hd:, :], (((2,), (1,)), ((), ())),
                      cast=False)
    beta = pv[:, :, 2 * hd:] / denom_lanes

    rf_ref[:, 0] = rf_k.astype(rf_ref.dtype)
    beta_ref[:, 0] = beta.astype(beta_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "nh", "gw", "j", "use_ln", "interpret"))
def eva_summaries_from_x(
    x: jax.Array,          # [B, N, D] LN'd tokens
    w_qkv: jax.Array, b_qkv: jax.Array,   # fused projection [D, 3HD], [3HD]
    wq: jax.Array, bq: jax.Array,
    wk: jax.Array, bk: jax.Array,
    lnq_scale, lnq_bias, lnk_scale, lnk_bias,
    *, nh: int, gw: int, j: int, use_ln: bool,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(rf_k_bar, beta)`` packed ``[B, C, H*D]``."""
    from efficient_attention_tpu.ops.pallas.eva_summaries import _block_diag

    B, N, D = x.shape
    three_hd = w_qkv.shape[1]
    hd = three_hd // 3
    d = hd // nh
    gh = N // gw
    hc, wc = gh // j, gw // j
    sgs = j * gw
    rb = 8 if B % 8 == 0 else (4 if B % 4 == 0 else 1)
    x4 = x.reshape(B, hc, sgs, D)
    grid = (B // rb, hc)
    x_spec = pl.BlockSpec((rb, 1, sgs, D), lambda b, r: (b, r, 0, 0),
                          memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, three_hd), lambda b, r: (0, 0),
                             memory_space=pltpu.VMEM)
    bqkv_spec = pl.BlockSpec((three_hd,), lambda b, r: (0,),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((three_hd, hd), lambda b, r: (0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((hd,), lambda b, r: (0,), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rb, 1, wc, hd), lambda b, r: (b, r, 0, 0),
                            memory_space=pltpu.VMEM)
    blk_q = _block_diag(wq, nh)
    blk_k = _block_diag(wk, nh)
    wq_big = jnp.zeros((three_hd, hd), jnp.float32).at[:hd].set(blk_q)
    wk_big = jnp.zeros((three_hd, hd), jnp.float32).at[hd:2 * hd].set(blk_k)
    tile = lambda v: jnp.tile(jnp.asarray(v, jnp.float32), nh)  # noqa: E731
    if lnq_scale is None:
        lnq_scale = jnp.ones((d,), jnp.float32)
        lnq_bias = jnp.zeros((d,), jnp.float32)
        lnk_scale = jnp.ones((d,), jnp.float32)
        lnk_bias = jnp.zeros((d,), jnp.float32)
    kern = functools.partial(_sum_kernel, nh=nh, d=d, j=j, gw=gw, wc=wc,
                             sgs=sgs, rb=rb, use_ln=use_ln)
    rf, beta = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, wqkv_spec, bqkv_spec, w_spec, v_spec, w_spec,
                  v_spec, v_spec, v_spec, v_spec, v_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((B, hc, wc, hd), x.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x4, w_qkv.astype(x.dtype), b_qkv.astype(jnp.float32),
      wq_big, tile(bq), wk_big, tile(bk),
      tile(lnq_scale), tile(lnq_bias), tile(lnk_scale), tile(lnk_bias))
    C = hc * wc
    return rf.reshape(B, C, hd), beta.reshape(B, C, hd)


# ------------------------------------------------------------- attention --


def _attn_kernel(x_ref, wqkv_ref, bqkv_ref, rf_ref, beta_ref, bias_ref,
                 wo_ref, bo_ref, o_ref, qkv_ref,
                 *, scale: float, nh: int, d: int, tgs: int, c: int):
    """Joint-softmax attention with the qkv projection computed into VMEM
    scratch (``qkv_ref``) and the output projection fused.  Attention math
    identical to ``eva_packed._kernel_fused_out``."""
    from efficient_attention_tpu.ops.pallas.eva_packed import _lane_pad

    qkv = jax.lax.dot_general(
        x_ref[:, 0], wqkv_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[...]
    qkv_ref[...] = qkv.astype(qkv_ref.dtype)
    pk, pv = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    outs = []
    for h in range(nh):
        qh = qkv_ref[:, :, h * d:(h + 1) * d]
        kh = qkv_ref[:, :, (nh + h) * d:(nh + h + 1) * d]
        vh = qkv_ref[:, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
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


@functools.partial(jax.jit, static_argnames=(
    "scale", "nh", "W", "ws", "interpret"))
def _attn_fwd(x, w_qkv, b_qkv, rf_p, beta_p, bias_big, wo, bo, scale, nh,
              W, ws, interpret=False):
    from efficient_attention_tpu.ops.pallas.eva_packed import _lane_pad

    B, N, D = x.shape
    three_hd = w_qkv.shape[1]
    hd = three_hd // 3
    d = hd // nh
    C = rf_p.shape[1]
    RB, TGS = _pick_rows(B, N, W, ws, C)
    ns = N // TGS
    x4 = x.reshape(B, ns, TGS, D)
    grid = (B // RB, ns)
    x_spec = pl.BlockSpec((RB, 1, TGS, D), lambda b, j: (b, j, 0, 0),
                          memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, three_hd), lambda b, j: (0, 0),
                             memory_space=pltpu.VMEM)
    bqkv_spec = pl.BlockSpec((three_hd,), lambda b, j: (0,),
                             memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, TGS, TGS), lambda b, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RB, 1, TGS, hd), lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    wo_spec = pl.BlockSpec((hd, hd), lambda b, j: (0, 0),
                           memory_space=pltpu.VMEM)
    bo_spec = pl.BlockSpec((hd,), lambda b, j: (0,),
                           memory_space=pltpu.VMEM)
    pk, pv = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    rf_in = jnp.pad(rf_p, ((0, 0), (0, 0), (pk, 0))) if pk else rf_p
    bt_in = jnp.pad(beta_p, ((0, 0), (0, 0), (pv, 0))) if pv else beta_p
    rf_spec = pl.BlockSpec((RB, C, pk + hd), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bt_spec = pl.BlockSpec((RB, C, pv + hd), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_attn_kernel, scale=scale, nh=nh, d=d,
                             tgs=TGS, c=C)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, wqkv_spec, bqkv_spec, rf_spec, bt_spec,
                  bias_spec, wo_spec, bo_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, ns, TGS, hd), x.dtype),
        scratch_shapes=[pltpu.VMEM((RB, TGS, three_hd), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x4, w_qkv.astype(x.dtype), b_qkv.astype(jnp.float32), rf_in, bt_in,
      bias_big, wo.astype(x.dtype), bo.astype(jnp.float32))
    return out.reshape(B, N, hd)


def eva_attention_from_x(
    x: jax.Array,          # [B, N, D] LN'd tokens
    w_qkv: jax.Array, b_qkv: jax.Array,
    rf_k_bar: jax.Array,   # [B, C, H*D]
    beta: jax.Array,
    wo: jax.Array, bo: jax.Array,
    scale: float,
    num_heads: int,
    W: int,
    ws: int,
    bias: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Eval-only fused forward: qkv projection + joint softmax + output
    projection in one kernel; returns ``[B, N, H*D]``."""
    B, N, D = x.shape
    nh = num_heads
    C = rf_k_bar.shape[1]
    _, TGS = _pick_rows(B, N, W, ws, C)
    Rj, mask_add = _strip_maps(W, ws, TGS)
    if bias is None:
        bias_big = jnp.broadcast_to(mask_add, (nh, TGS, TGS))
    else:
        bias_big = _bias_to_token_coords(bias, Rj) + mask_add
    return _attn_fwd(x, w_qkv, b_qkv, rf_k_bar, beta, bias_big, wo, bo,
                     float(scale), nh, W, ws, interpret=interpret)
