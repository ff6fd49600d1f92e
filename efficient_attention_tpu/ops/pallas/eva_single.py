"""Single-pass fused EVA: chunk summaries + joint attention in ONE kernel.

Round-3 measurements isolated the EVA attention half's gap to roofline in
two mechanisms: (1) the summaries stage and the attention kernel each
stream the full packed ``qkv [B, N, 3*H*D]`` from HBM (2x115 MB at the
bench geometry), and (2) every extra custom-call boundary forces XLA to
materialize operands it would otherwise fuse.  This kernel removes both:
``qkv`` is read from HBM exactly once, the summaries never touch HBM, and
there is one custom-call boundary instead of two.

This is v3.  v1 (flat 8-aligned strips) measured 3.42 ms/module; v2
(window-row blocks, everything unrolled in one grid step per batch block)
was parity-correct in interpret mode but took >20 minutes of Mosaic
compile at EVERY geometry tried on the real chip (reproduced twice, B=128
and B=4) and was never raceable.  Three structural causes, each fixed
here:

* **Phases as grid steps, not unrolled code.**  v2 unrolled phase 1
  (3 passes x ns blocks) AND phase 2 (ns x nh attention iterations) into
  one flat kernel body.  v3 uses grid ``(B//RB, ns)`` with the whole
  batch element resident via an index map constant in ``s`` (Pallas skips
  the re-fetch when consecutive grid steps map the same block): phase 1
  runs once under ``pl.when(s == 0)`` writing the summaries into VMEM
  scratch that persists across the ``ns`` sequential steps, and each grid
  step runs exactly the packed kernel's per-strip attention.  The Mosaic
  program is ~the packed kernel plus one summary block.
* **Membership matrices are operands.**  v2 rebuilt the ``ns`` chunk
  -membership iota matrices inside the kernel; v3 passes the static
  ``P [ns, C8, TGS]`` 0/1 matrix in (XLA constant-folds it outside).
* **No online-max passes.**  The per-chunk softmax over ``logp =
  <mu_c, k_t>/sqrt(d) - |k_t|^2/(2 sqrt(d))`` completes the square:
  ``logp = |mu_c|^2/(2 sqrt(d)) - |k_t - mu_c|^2/(2 sqrt(d))``, so
  ``m_c = |mu_c|^2/(2 sqrt(d))`` is a data-independent EXACT upper bound
  — shifting by it gives ``exp(logp - m_c) = exp(-|k_t-mu_c|^2/(2
  sqrt(d))) in (0, 1]`` with no max pass at all.  This kills v2's
  ``[RB, C8, TGS, H]`` masked-max tensor whose H=3 lane dim padded to
  128 (~90 MB of padded VMEM traffic at the bench geometry).

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
    (x2 for the next batch group's pipelined fetch) + the out block +
    per-strip f32 logits [RB, TGS, TGS + C8] (x2 for p) + phase-1
    temporaries; cap around ~48MB so the 100MB scoped limit keeps
    headroom for Mosaic's own temporaries."""
    hd = three_hd // 3
    for rb in (16, 8, 4, 2, 1):
        if B % rb:
            continue
        total = rb * N * three_hd * itemsize * 2       # resident (x2 pipe)
        total += rb * tgs * hd * itemsize * 2          # out (x2 pipe)
        total += rb * tgs * (tgs + c8) * 4 * 2         # logits + p
        total += rb * c8 * three_hd * 4 * 4            # means/rf/mu/pv f32
        total += rb * tgs * three_hd * 4               # phase-1 per-s tmp
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


def _chunk_membership(gh: int, gw: int, j: int, tgs: int, ns: int,
                      c8: int) -> np.ndarray:
    """Static ``[ns, C8, TGS]`` 0/1 membership: entry (s, c, t) = 1 iff
    global token ``s*TGS + t`` lies in chunk ``c`` (row-major
    ``(row//j)*wc + col//j``); pad chunk rows (c >= hc*wc) are all-zero.
    Passed to the kernel as an operand (v2 built these from iota inside
    the kernel — a measured Mosaic compile-time disaster)."""
    wc = gw // j
    C = (gh // j) * wc
    out = np.zeros((ns, c8, tgs), np.float32)
    for s in range(ns):
        g = s * tgs + np.arange(tgs)
        chunk = (g // gw // j) * wc + (g % gw) // j
        valid = chunk < C
        out[s, chunk[valid], np.arange(tgs)[valid]] = 1.0
    return out


def _kernel(block_ref, p_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            lnq_s_ref, lnq_b_ref, lnk_s_ref, lnk_b_ref,
            add_ref, o_ref, rf_scr, bt_scr,
            *, scale, nh, d, j, tgs, c8, rb, use_ln, exact):
    """Grid (B//RB, ns): step (b, 0) computes the chunk summaries over the
    resident ``[RB, ns, TGS, 3HD]`` element into persistent scratch; every
    step (b, s) then runs the packed kernel's joint local/chunk attention
    for window-row strip ``s``."""
    hd = nh * d
    ns = block_ref.shape[1]
    s_idx = pl.program_id(1)
    prec = HI if exact else jax.lax.Precision.DEFAULT
    ct = jnp.float32 if exact else block_ref.dtype
    pk, pv_off = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)

    def dot(a, b, dims, cast=True):
        t = ct if cast else jnp.float32
        return jax.lax.dot_general(a.astype(t), b.astype(t), dims,
                                   precision=prec,
                                   preferred_element_type=jnp.float32)

    @pl.when(s_idx == 0)
    def _phase1():
        # ---- chunk summaries (eva_summaries math, accumulated over the
        # ns resident strips).  The proposal/projection part runs in
        # lane-packed [RB, C8, 3HD] matmul form; the per-token softmax part
        # runs PER HEAD in [RB, C8, TGS] form — full 128-lane utilization
        # where the first single-kernel race's lane-packed [RB, TGS, H=3]
        # tensors used 3 lanes of 128 and measured 2.21 vs packed 1.43
        # ms/layer.  (A merged [RB, N, 3HD] full-block value + one matmul
        # per head raced SLOWER — 1.68 vs this form's 1.33 — because the
        # whole-block load materializes a 14.5MB VMEM copy; the per-strip
        # ref slices don't.)
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
        Pb = [jnp.broadcast_to(p_ref[s][None], (rb, c8, tgs))
              for s in range(ns)]

        means = sum(dot(Pb[s] / float(j * j),
                        block_ref[:, s].astype(ct), bdims)
                    for s in range(ns))                  # [RB, C8, 3HD]
        rf_k = dot(means, wk_ref[...], (((2,), (0,)), ((), ())),
                   cast=False) + bk_ref[...]
        rf_q = dot(means, wq_ref[...], (((2,), (0,)), ((), ())),
                   cast=False) + bq_ref[...]
        if use_ln:
            rf_k = ln(rf_k, lnk_s_ref[...], lnk_b_ref[...])
            rf_q = ln(rf_q, lnq_s_ref[...], lnq_b_ref[...])
        mu = 0.5 * (rf_q + rf_k)                         # [RB, C8, HD]
        rf_scr[:, :, pk:pk + hd] = rf_k

        cdims = (((2,), (2,)), ((0,), (0,)))   # [.,c8,d] x [.,tgs,d]
        for h in range(nh):
            mu_h = mu[:, :, h * d:(h + 1) * d]           # [RB, C8, D] f32
            # exact data-independent stabilizer:
            # logp = <mu,k>dn - |k|^2 dn/2 = |mu|^2 dn/2 - |k-mu|^2 dn/2
            # <= m_c := |mu|^2 dn/2, so no online max pass is needed.
            m_c = (0.5 * dn) * jnp.sum(mu_h * mu_h, axis=-1)  # [RB, C8]
            den = jnp.zeros((rb, c8), jnp.float32)
            pv = jnp.zeros((rb, c8, d), jnp.float32)
            for s in range(ns):
                kh = block_ref[:, s, :, (nh + h) * d:(nh + h + 1) * d]
                vh = block_ref[:, s, :,
                               (2 * nh + h) * d:(2 * nh + h + 1) * d]
                dash = dn * dot(mu_h.astype(ct), kh, cdims)  # [RB,C8,TGS]
                kf = kh.astype(jnp.float32)
                norm = (0.5 * dn) * jnp.sum(kf * kf, axis=-1)  # [RB, TGS]
                p = jnp.exp(dash - norm[:, None, :] - m_c[:, :, None]) \
                    * Pb[s]                              # [RB, C8, TGS]
                den = den + jnp.sum(p, axis=-1)
                pv = pv + dot(p, vh, bdims)              # [RB, C8, D]
            den = jnp.maximum(den, 1e-30)  # pad chunks: 0 members -> 0
            # write into lane-padded scratch so phase 2's ref slices land
            # at the same lane offset as the matching qkv section (concat
            # legality, eva_packed._lane_pad)
            bt_scr[:, :, pv_off + h * d:pv_off + (h + 1) * d] = \
                pv / den[:, :, None]

    # ---- phase 2: joint local/chunk attention for strip s
    # (eva_packed._kernel math; rf/beta sourced from scratch refs).  The
    # head extraction slices the REF with the dynamic strip index — a
    # materialized ``block_ref[:, s_idx]`` value relayouts to lane offset
    # 0 and the [kh | rfh] concat then fails Mosaic's matching-offset rule
    # (rfh's scratch slice sits at the _lane_pad offset by construction).
    for h in range(nh):
        qh = block_ref[:, s_idx, :, h * d:(h + 1) * d]
        kh = block_ref[:, s_idx, :, (nh + h) * d:(nh + h + 1) * d]
        vh = block_ref[:, s_idx, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
        rfh = rf_scr[:, :, pk + h * d:pk + (h + 1) * d]
        bth = bt_scr[:, :, pv_off + h * d:pv_off + (h + 1) * d]
        keys = jnp.concatenate([kh, rfh.astype(kh.dtype)], axis=1)
        vals = jnp.concatenate([vh, bth.astype(vh.dtype)], axis=1)
        logits = jax.lax.dot_general(
            qh, keys, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                        # [RB, TGS, TGS+C8]
        logits = logits + add_ref[h][None]
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        dnm = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, 0, :, h * d:(h + 1) * d] = (out / dnm).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "scale", "nh", "gw", "ws", "j", "use_ln", "interpret"))
def _fwd(qkv, P, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s, lnk_b,
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
    grid = (B // rb, ns)
    # the qkv index map is CONSTANT in s: the whole element stays resident
    # across the ns sequential steps and is fetched from HBM once per b
    qkv_spec = pl.BlockSpec((rb, ns, tgs, three_hd),
                            lambda b, s: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((ns, c8, tgs), lambda b, s: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((three_hd, hd), lambda b, s: (0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((hd,), lambda b, s: (0,),
                          memory_space=pltpu.VMEM)
    add_spec = pl.BlockSpec((nh, tgs, tgs + c8), lambda b, s: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rb, 1, tgs, hd), lambda b, s: (b, s, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel, scale=scale, nh=nh, d=d, j=j, tgs=tgs,
        c8=c8, rb=rb, use_ln=use_ln, exact=exact)
    pk, pv_off = _lane_pad(nh, d, 1), _lane_pad(nh, d, 2)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qkv_spec, p_spec, w_spec, v_spec, w_spec, v_spec,
                  v_spec, v_spec, v_spec, v_spec, add_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, ns, tgs, hd), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((rb, c8, pk + hd), jnp.float32),
            pltpu.VMEM((rb, c8, pv_off + hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nh * N * (tgs + c8) * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + B * N * hd * qkv.dtype.itemsize,
            transcendentals=B * nh * N * (tgs + c8),
        ),
        interpret=interpret,
    )(qkv4, P, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s, lnk_b, add_big)
    return out.reshape(B, N, hd)


def eva_single_twin(qkv, P, wq_big, bq, wk_big, bk, lnq_s, lnq_b,
                    lnk_s, lnk_b, add_big, *, scale, nh, j, use_ln):
    """Pure-XLA functional twin of the kernel math over the SAME packed
    operands.  Two jobs: (1) the custom-vjp backward fallback — a caller
    differentiating the eval path (e.g. a grad of a deterministic forward)
    gets the exact gradient of this form instead of a Mosaic AD error;
    (2) an independently testable statement of what the kernel computes."""
    B, N, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // nh
    ns, c8, tgs = P.shape
    dn = d ** -0.5
    x4 = qkv.reshape(B, ns, tgs, three_hd).astype(jnp.float32)
    means = jnp.einsum("sct,bstf->bcf", P, x4) / float(j * j)
    rf_k = means @ wk_big + bk
    rf_q = means @ wq_big + bq
    if use_ln:
        def ln(x, s, b, eps=1e-6):
            xh = x.reshape(B, c8, nh, d)
            m = xh.mean(-1, keepdims=True)
            var = (xh * xh).mean(-1, keepdims=True) - m * m
            y = (xh - m) * jax.lax.rsqrt(var + eps)
            return y.reshape(B, c8, hd) * s + b

        rf_k = ln(rf_k, lnk_s, lnk_b)
        rf_q = ln(rf_q, lnq_s, lnq_b)
    muh = (0.5 * (rf_q + rf_k)).reshape(B, c8, nh, d)
    qh = x4[..., :hd].reshape(B, ns, tgs, nh, d)
    kh = x4[..., hd:2 * hd].reshape(B, ns, tgs, nh, d)
    vh = x4[..., 2 * hd:].reshape(B, ns, tgs, nh, d)
    # per-chunk softmax over member tokens, stabilized by the exact
    # data-independent bound m_c = |mu|^2/(2 sqrt(d)) (see kernel docstring)
    m_c = (0.5 * dn) * jnp.sum(muh * muh, -1)                # [B, C8, H]
    dash = dn * jnp.einsum("bchd,bsthd->bcsth", muh, kh)
    norm = (0.5 * dn) * jnp.sum(kh * kh, -1)                 # [B,ns,tgs,H]
    p = jnp.exp(dash - norm[:, None] - m_c[:, :, None, None])
    p = p * P.transpose(1, 0, 2)[None, :, :, :, None]
    # clamp at 1e-15, NOT the kernel's 1e-30: the VJP divides by den^2
    # and (1e-30)^2 underflows f32 to zero -> 0/0 NaN for pad chunks
    den = jnp.maximum(p.sum((2, 3)), 1e-15)                  # [B, C8, H]
    beta = jnp.einsum("bcsth,bsthd->bchd", p, vh) / den[..., None]
    # joint local/chunk attention per strip: keys [kh | rf_k], vals
    # [vh | beta], one additive table carrying bias/visibility/pad-chunks
    rf_kh = rf_k.reshape(B, c8, nh, d)
    logits = jnp.concatenate([
        jnp.einsum("bsthd,bsuhd->bshtu", qh, kh),
        jnp.einsum("bsthd,bchd->bshtc", qh, rf_kh),
    ], axis=-1) * scale + add_big[None, None]
    w = jax.nn.softmax(logits, axis=-1)
    out = (jnp.einsum("bshtu,bsuhd->bsthd", w[..., :tgs], vh)
           + jnp.einsum("bshtc,bchd->bsthd", w[..., tgs:], beta))
    return out.reshape(B, N, hd).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15,
                                                    16, 17))
def _single(qkv, P, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s, lnk_b,
            add_big, scale, nh, gw, ws, j, use_ln, interpret):
    return _fwd(qkv, P, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s,
                lnk_b, add_big, scale, nh, gw, ws, j, use_ln,
                interpret=interpret)


def _single_fwd(qkv, P, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s,
                lnk_b, add_big, scale, nh, gw, ws, j, use_ln, interpret):
    out = _single(qkv, P, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s,
                  lnk_b, add_big, scale, nh, gw, ws, j, use_ln, interpret)
    return out, (qkv, P, wq_big, bq, wk_big, bk, lnq_s, lnq_b, lnk_s,
                 lnk_b, add_big)


def _single_bwd(scale, nh, gw, ws, j, use_ln, interpret, res, g):
    # the kernel is eval-only; gradients (rare: grad of a deterministic
    # forward) fall back to the exact VJP of the XLA twin at the saved
    # inputs — correct everywhere, not tuned for speed (training uses the
    # packed kernels whose fused VJP is registered)
    _, vjp = jax.vjp(
        functools.partial(eva_single_twin, scale=scale, nh=nh, j=j,
                          use_ln=use_ln), *res)
    return vjp(g)


_single.defvjp(_single_fwd, _single_bwd)


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
    ns = N // tgs
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

    P = jnp.asarray(_chunk_membership(gh, gw, j, tgs, ns, c8))

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
    return _single(qkv, P, wq_big, tile(bq), wk_big, tile(bk),
                   tile(lnq_scale), tile(lnq_bias), tile(lnk_scale),
                   tile(lnk_bias), add_big, float(scale), nh, gw, ws,
                   j, use_ln, interpret)
