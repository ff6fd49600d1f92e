"""Single-pass fused EVA: chunk summaries + joint attention in ONE kernel.

Round-3 measurements isolated the EVA attention half's gap to roofline in
two mechanisms: (1) the summaries stage and the attention kernel each
stream the full packed ``qkv [B, N, 3*H*D]`` from HBM (2x115 MB at the
bench geometry), and (2) every extra custom-call boundary forces XLA to
materialize operands it would otherwise fuse.  This kernel removes both:
one ``pallas_call`` whose grid step holds one batch block's ENTIRE
``[RB, ns, TGS, 3HD]`` qkv slice resident in VMEM (~0.9 MB/element bf16
at the bench geometry), computes the per-chunk adaptive summaries
``rf_k_bar``/``beta`` into VMEM scratch, then runs the joint local+chunk
softmax for every window-row block and writes ``[RB, ns, TGS, HD]`` —
qkv is read from HBM exactly once and the summaries never touch HBM.

Two v1 post-mortems shaped this layout (v1 measured 3.42 vs the
two-kernel path's 2.85 ms/module on v5e):

* **Window-row blocks, not 8-aligned flat strips.**  v1 kept the token
  axis flat, so in-kernel sublane slices had to be 8-aligned and the
  attention strip grew to TWO window rows (392 tokens at the bench
  geometry) with the cross-row half masked — 1.8x the logit/exp work of
  the packed kernel.  v2 reshapes to ``[B, ns, TGS, 3HD]`` OUTSIDE the
  kernel (free: contiguous split), making one window row (``TGS = W*ws``)
  a full block dimension exactly like ``eva_packed._fwd``; in-kernel
  indexing ``block_ref[:, s]`` needs no sublane alignment.  The chunk
  summaries accumulate across the ``ns`` resident blocks through
  per-block 0/1 membership matmuls (three static passes: means,
  chunk-max, exp-sums — all VMEM-resident traffic).
* **Scratch refs + lane-pad for the merged-operand concat.**  The joint
  ``[kh | rf]`` key concat (packed kernel's measured 0.98 -> 0.76 ms
  trick) is Mosaic-legal only at matching lane offsets; summaries are
  written once into scratch refs whose lane offset is front-padded to the
  matching qkv section offset (``eva_packed._lane_pad``), then phase 2
  slices the REFS exactly as the packed kernel slices its HBM operands.

Eval-only (the training path keeps the matmul-form summaries + packed
kernel whose VJP is registered).  Reference semantics:
``efficient-attention/efficient_attention/eva.py:178-196`` (summaries:
mu = (mu_q(mean q) + mu_k(mean k))/2, omega = mu at eval, beta =
per-chunk SNIS value summary) and ``eva.py:200-227`` (joint softmax over
[local | chunk]).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficient_attention_tpu.ops.pallas.eva_packed import (
    MASK_VAL,
    _bias_to_token_coords,
    _lane_pad,
    _strip_maps,
)

HI = jax.lax.Precision.HIGHEST


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def _pick_rb(B: int, N: int, three_hd: int, tgs: int, c8: int,
             itemsize: int) -> Optional[int]:
    """Batch rows per grid step.  VMEM budget: the resident qkv block
    (double-buffered by the pipeline) + the out block + per-window f32
    logits [RB, TGS, TGS + C8] + summary temporaries; cap the dominant
    terms around ~48MB so the 100MB scoped limit keeps headroom for
    Mosaic's own temporaries."""
    hd = three_hd // 3
    for rb in (16, 8, 4, 2, 1):
        if B % rb:
            continue
        total = rb * N * three_hd * itemsize * 2       # in (x2 pipeline)
        total += rb * N * hd * itemsize                # out
        total += rb * tgs * (tgs + c8) * 4 * 3         # logits, p, slack
        total += rb * c8 * tgs * 4                     # chunk-max select
        total += rb * N * 4 * 4                        # logp + phase-1 tmp
        if total <= 48 * 1024 * 1024:
            return rb
    return None


def supports_single(B: int, gh: int, gw: int, ws: int, j: int,
                    adaptive_proj: str, three_hd: int,
                    itemsize: int = 2) -> bool:
    """Geometry gate: 2-D square windows/chunks dividing the grid and a
    whole batch element fitting the VMEM budget."""
    if adaptive_proj not in ("default", "no-ln") or ws <= 0 or j <= 0:
        return False
    if gh % ws or gw % ws or gh % j or gw % j:
        return False
    N = gh * gw
    tgs = gw * ws
    if N % tgs:
        return False
    c8 = _round8((gh // j) * (gw // j))
    return _pick_rb(B, N, three_hd, tgs, c8, itemsize) is not None


def _chunk_maps(gh: int, gw: int, j: int, tgs: int, ns: int, c8: int):
    """Static per-window-row-block chunk-membership matrices, built from
    iota (Pallas kernels cannot capture host constants).

    ``P[s] [c8, TGS]``: entry (c, t) = 1 iff global token ``s*TGS + t``
    lies in chunk ``c`` (row-major ``(row//j)*wc + col//j``); pad chunk
    rows (c >= hc*wc) are all-zero."""
    wc = gw // j
    C = (gh // j) * wc
    out = []
    for s in range(ns):
        n_idx = jax.lax.broadcasted_iota(jnp.int32, (c8, tgs), 1)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (c8, tgs), 0)
        g = n_idx + s * tgs
        chunk = (g // gw // j) * wc + (g % gw) // j
        out.append(((chunk == c_idx) & (c_idx < C)).astype(jnp.float32))
    return out


def _kernel(block_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            lnq_s_ref, lnq_b_ref, lnk_s_ref, lnk_b_ref,
            add_ref, o_ref, rf_scr, bt_scr,
            *, scale, nh, d, j, gh, gw, tgs, c8, rb, use_ln, exact):
    """One grid step = RB full batch elements: chunk summaries
    accumulated over the ns resident window-row blocks, then each
    block's joint local/chunk attention (packed-kernel math)."""
    hd = nh * d
    ns = block_ref.shape[1]
    prec = HI if exact else jax.lax.Precision.DEFAULT
    ct = jnp.float32 if exact else block_ref.dtype

    def dot(a, b, dims, cast=True):
        t = ct if cast else jnp.float32
        return jax.lax.dot_general(a.astype(t), b.astype(t), dims,
                                   precision=prec,
                                   preferred_element_type=jnp.float32)

    # ---- phase 1: chunk summaries (eva_summaries._kernel math, block-
    # accumulated).  Selector matmuls express all per-head structure —
    # never 64-lane slices of the 576-lane strip (v1/v2 post-mortem
    # there) ----
    Ps = [jnp.asarray(P) for P in _chunk_maps(gh, gw, j, tgs, ns, c8)]
    Pb = [jnp.broadcast_to(P[None], (rb, c8, tgs)) for P in Ps]
    PbT = [jnp.broadcast_to(P.T[None], (rb, tgs, c8)) for P in Ps]
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

    def ln(x, scale_v, bias_v, eps=1e-6):
        mean = dot(x, M_avg, (((2,), (0,)), ((), ())), cast=False)
        m2 = dot(x * x, M_avg, (((2,), (0,)), ((), ())), cast=False)
        var = m2 - mean * mean
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale_v + bias_v

    dn = d ** -0.5
    blocks = [block_ref[:, s].astype(ct) for s in range(ns)]

    means = sum(dot(Pb[s] / float(j * j), blocks[s], bdims)
                for s in range(ns))                      # [RB, C8, 3HD]
    rf_k = dot(means, wk_ref[...], (((2,), (0,)), ((), ())),
               cast=False) + bk_ref[...]
    rf_q = dot(means, wq_ref[...], (((2,), (0,)), ((), ())),
               cast=False) + bq_ref[...]
    if use_ln:
        rf_k = ln(rf_k, lnk_s_ref[...], lnk_b_ref[...])
        rf_q = ln(rf_q, lnq_s_ref[...], lnq_b_ref[...])
    mu = 0.5 * (rf_q + rf_k)                             # [RB, C8, HD]

    # pass 2: per-token log-densities + per-chunk max
    logps = []
    m = jnp.full((rb, c8, nh), -1e30, jnp.float32)
    for s in range(ns):
        w_tok = dot(PbT[s], mu, bdims, cast=False)       # [RB, TGS, HD]
        w_full = jnp.pad(w_tok.astype(ct), ((0, 0), (0, 0), (hd, hd)))
        dash = dn * dot(blocks[s] * w_full, S_k, (((2,), (0,)), ((), ())))
        norm = (0.5 * dn) * dot(blocks[s] * blocks[s], S_k,
                                (((2,), (0,)), ((), ())))
        logp = dash - norm                               # [RB, TGS, H]
        logps.append(logp)
        lp_c = jnp.where(Pb[s][..., None] > 0, logp[:, None],
                         jnp.float32(-1e30))             # [RB, C8, TGS, H]
        m = jnp.maximum(m, jnp.max(lp_c, axis=2))        # [RB, C8, H]

    # pass 3: stable exp-sums and the SNIS value summary
    denom = jnp.zeros((rb, c8, nh), jnp.float32)
    pv = jnp.zeros((rb, c8, 3 * hd), jnp.float32)
    for s in range(ns):
        m_tok = dot(PbT[s], m, bdims, cast=False)        # [RB, TGS, H]
        p = jnp.exp(logps[s] - m_tok)
        denom = denom + dot(Pb[s], p, bdims, cast=False)
        p_lanes = dot(p, S_v, (((2,), (1,)), ((), ())), cast=False)
        pv = pv + dot(Pb[s], blocks[s] * p_lanes.astype(ct), bdims)
    denom = jnp.maximum(denom, 1e-30)  # pad chunks: 0 members -> beta 0
    denom_lanes = dot(denom, S_v[2 * hd:, :], (((2,), (1,)), ((), ())),
                      cast=False)
    beta = pv[:, :, 2 * hd:] / denom_lanes               # [RB, C8, HD]

    # write ONCE into lane-padded scratch so phase 2's ref slices land at
    # the same lane offset as the matching qkv section (concat legality)
    pk, pv_off = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    rf_scr[:, :, pk:pk + hd] = rf_k
    bt_scr[:, :, pv_off:pv_off + hd] = beta

    # ---- phase 2: joint local/chunk attention per window-row block
    # (eva_packed._kernel math; rf/beta sourced from scratch refs) ----
    for s in range(ns):
        for h in range(nh):
            qh = block_ref[:, s, :, h * d:(h + 1) * d]
            kh = block_ref[:, s, :, (nh + h) * d:(nh + h + 1) * d]
            vh = block_ref[:, s, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
            rfh = rf_scr[:, :, pk + h * d:pk + (h + 1) * d]
            bth = bt_scr[:, :, pv_off + h * d:pv_off + (h + 1) * d]
            keys = jnp.concatenate([kh, rfh.astype(kh.dtype)], axis=1)
            vals = jnp.concatenate([vh, bth.astype(vh.dtype)], axis=1)
            logits = jax.lax.dot_general(
                qh, keys, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale                                    # [RB, TGS, TGS+C8]
            logits = logits + add_ref[h][None]
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            dnm = jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:, s, :, h * d:(h + 1) * d] = \
                (out / dnm).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "scale", "nh", "gw", "ws", "j", "use_ln", "interpret"))
def _fwd(qkv, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s, lnk_b,
         add_big, scale, nh, gw, ws, j, use_ln, interpret=False):
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    hd = nh * d
    gh = N // gw
    tgs = gw * ws
    ns = N // tgs
    c8 = _round8((gh // j) * (gw // j))
    exact = qkv.dtype == jnp.float32
    rb = _pick_rb(B, N, three_hd, tgs, c8,
                  4 if exact else qkv.dtype.itemsize)
    qkv4 = qkv.reshape(B, ns, tgs, three_hd)   # free: contiguous split
    grid = (B // rb,)
    qkv_spec = pl.BlockSpec((rb, ns, tgs, three_hd), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((three_hd, hd), lambda b: (0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((hd,), lambda b: (0,), memory_space=pltpu.VMEM)
    add_spec = pl.BlockSpec((nh, tgs, tgs + c8), lambda b: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rb, ns, tgs, hd), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel, scale=scale, nh=nh, d=d, j=j, gh=gh, gw=gw, tgs=tgs,
        c8=c8, rb=rb, use_ln=use_ln, exact=exact)
    pk, pv_off = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qkv_spec, w_spec, v_spec, w_spec, v_spec,
                  v_spec, v_spec, v_spec, v_spec, add_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, ns, tgs, hd), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((rb, c8, pk + hd), jnp.float32),
            pltpu.VMEM((rb, c8, pv_off + hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nh * N * (tgs + c8) * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + B * N * hd * qkv.dtype.itemsize,
            transcendentals=B * nh * N * (tgs + c8),
        ),
        interpret=interpret,
    )(qkv4, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s, lnk_b, add_big)
    return out.reshape(B, N, hd)


def eva_attention_single(
    qkv: jax.Array,                      # [B, N, 3*H*D]
    wq: jax.Array, bq: jax.Array,        # adaptive_mu_q Dense [d, d], [d]
    wk: jax.Array, bk: jax.Array,        # adaptive_mu_k Dense
    lnq_scale: Optional[jax.Array], lnq_bias: Optional[jax.Array],
    lnk_scale: Optional[jax.Array], lnk_bias: Optional[jax.Array],
    scale: float,
    num_heads: int,
    gw: int,                             # token-grid width
    ws: int,                             # window side
    j: int,                              # chunk side (rf_win_size)
    use_ln: bool,
    bias: Optional[jax.Array] = None,    # [H, S, S] Swin-local RPE bias
    interpret: bool = False,
) -> jax.Array:
    """Eval-only single-pass EVA forward; returns ``[B, N, H*D]``."""
    B, N, three_hd = qkv.shape
    nh = num_heads
    d = three_hd // (3 * nh)
    hd = nh * d
    gh = N // gw
    tgs = gw * ws
    C = (gh // j) * (gw // j)
    c8 = _round8(C)

    Rj, mask_add = _strip_maps(gw, ws, tgs)
    if bias is None:
        bias_big = jnp.broadcast_to(mask_add, (nh, tgs, tgs))
    else:
        bias_big = _bias_to_token_coords(bias, Rj) + mask_add
    # joint additive table [H, TGS, TGS+C8]: local bias/visibility followed
    # by the chunk columns (always visible; pad chunks carry MASK_VAL)
    col = np.arange(c8)
    cmask = jnp.asarray(np.where(col < C, 0.0, MASK_VAL), jnp.float32)
    add_big = jnp.concatenate(
        [bias_big, jnp.broadcast_to(cmask, (nh, tgs, c8))], axis=-1)

    # block-diagonal per-head adaptive Dense, placed in the q-/k-section
    # rows (same packing as eva_summaries)
    def _block_diag(w):
        out = jnp.zeros((hd, hd), jnp.float32)
        for h in range(nh):
            out = out.at[h * d:(h + 1) * d, h * d:(h + 1) * d].set(
                jnp.asarray(w, jnp.float32))
        return out

    wq_big = jnp.zeros((three_hd, hd), jnp.float32).at[:hd].set(
        _block_diag(wq))
    wk_big = jnp.zeros((three_hd, hd), jnp.float32).at[hd:2 * hd].set(
        _block_diag(wk))
    tile = lambda v: jnp.tile(jnp.asarray(v, jnp.float32), nh)  # noqa: E731
    if lnq_scale is None:
        lnq_scale = jnp.ones((d,), jnp.float32)
        lnq_bias = jnp.zeros((d,), jnp.float32)
        lnk_scale = jnp.ones((d,), jnp.float32)
        lnk_bias = jnp.zeros((d,), jnp.float32)
    return _fwd(qkv, wq_big, tile(bq), wk_big, tile(bk),
                tile(lnq_scale), tile(lnq_bias), tile(lnk_scale),
                tile(lnk_bias), add_big, float(scale), nh, gw, ws,
                j, use_ln, interpret=interpret)
