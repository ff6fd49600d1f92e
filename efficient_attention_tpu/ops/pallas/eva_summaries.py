"""Fused EVA chunk-summary kernel: one pass over qkv -> (rf_k_bar, beta).

The eval-path chunk summaries were the EVA module's single most expensive
stage at the bench geometry (0.82 ms of a 1.68 ms module — measured by
``scripts/bench_eva_module_stages.py``): XLA executes the 6-D strided
chunk reductions of ``EVA._chunk_summaries_packed`` at ~140 GB/s effective
HBM bandwidth because every reduction re-reads ``qkv`` through a strided
view.  The computation is a handful of MFLOPs whose only real cost is
reading ``qkv`` once — this kernel does exactly that: a grid step reads one
contiguous block of chunk-row strips (``j`` token rows each), computes the
per-chunk means, the adaptive proposals, the prm log-density and the SNIS
value summary ``beta`` in VMEM, and writes only tiny ``[RB, wc, H*D]``
summary blocks.

Layout discipline (v3 — v1/v2 post-mortem): every big tensor keeps the
FULL packed lane width (576 = 3*H*D); per-head structure is expressed with
block-diagonal weight matrices and 0/1 selector matmuls instead of 64-lane
head slices (which forced Mosaic relayouts on every slice and ran SLOWER
than XLA, 1.2-1.9 ms).  All matmuls run at HIGHEST precision — they are
tiny (the heavy traffic is the strip read), and exact-f32 math is required
because the adaptive LayerNorm amplifies bf16 MXU truncation of the chunk
means into ~1e-2 drift in ``rf_k_bar`` (measured on v5e; same failure mode
documented at ``attention/eva.py`` ``_chunk_summaries_packed``).

Reference semantics: ``efficient-attention/efficient_attention/eva.py:178-196``
(per-chunk proposal mu = (mu_q(mean q) + mu_k(mean k))/2, omega = mu at
eval, beta = softmax(<omega, k>/sqrt(d) - |k|^2/(2 sqrt(d))) @ v per chunk).
Eval-only: training keeps the XLA matmul formulation (whose VJP is plain
matmuls) in ``EVA._chunk_summaries_packed``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST


def _kernel(qkv_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            lnq_s_ref, lnq_b_ref, lnk_s_ref, lnk_b_ref,
            rf_ref, beta_ref,
            *, nh: int, d: int, j: int, gw: int, wc: int, sgs: int,
            rb: int, use_ln: bool, exact: bool):
    """One grid step: RB batch rows x one chunk-row strip (j*gw tokens).

    Chunk membership inside the strip is static: token t belongs to chunk
    column (t % gw) // j.  All chunk reductions route through the 0/1
    membership matrix ``P [wc, SGS]`` (baked from iota at compile time);
    per-head reductions/broadcasts over the 576-lane packed axis use 0/1
    selector matmuls.  Operand refs:

      wq/wk    [576, H*D]  block-diagonal adaptive Dense acting on the
               q-/k-section rows of a [.., 576] mean vector
      bq/bk, ln* [H*D]     per-head-tiled bias / LayerNorm params

    ``exact=True`` (f32 inputs): every dot runs at HIGHEST precision and
    the strip is widened to f32 — ~1e-6 parity with an exact-f32 XLA
    reference, at ~3x the runtime.  ``exact=False`` (bf16 inputs): dots run
    native bf16 with f32 accumulation; nothing to preserve.
    """
    hd = nh * d
    prec = HI if exact else jax.lax.Precision.DEFAULT
    ct = jnp.float32 if exact else qkv_ref.dtype  # elementwise compute type

    def dot(a, b, dims, cast=True):
        # cast=True: big strip-touching dots run in the input dtype (native
        # bf16 on the fast path).  cast=False: tiny dots stay f32 — free,
        # and Mosaic cannot shape-cast small odd-sublane bf16 vectors
        # ("[16,7,576]bf16 -> [112,576] unsupported shape cast")
        t = ct if cast else jnp.float32
        return jax.lax.dot_general(a.astype(t), b.astype(t), dims,
                                   precision=prec,
                                   preferred_element_type=jnp.float32)

    n_idx = jax.lax.broadcasted_iota(jnp.int32, (wc, sgs), 1)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (wc, sgs), 0)
    P = ((n_idx % gw) // j == c_idx).astype(jnp.float32)     # [wc, SGS]
    Pb = jnp.broadcast_to(P[None], (rb, wc, sgs))
    Pmb = Pb / float(j * j)
    PbT = jnp.broadcast_to(P.T[None], (rb, sgs, wc))
    # selectors over the packed lane axis
    f_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * hd, nh), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * hd, nh), 1)
    sec = f_idx // hd                  # 0=q, 1=k, 2=v
    head_of = (f_idx % hd) // d
    S_k = ((sec == 1) & (head_of == h_idx)).astype(jnp.float32)  # [3HD, H]
    S_v = ((sec == 2) & (head_of == h_idx)).astype(jnp.float32)
    # per-head lane-group averaging matrix for the LayerNorm stats
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1)
    M_avg = (a_idx // d == b_idx // d).astype(jnp.float32) / float(d)

    bdims = (((2,), (1,)), ((0,), (0,)))   # batched [rb, m, k] x [rb, k, n]

    def ln(x, scale, bias, eps=1e-6):
        # per-head LayerNorm on [.., H*D] lanes: group stats via M_avg
        mean = dot(x, M_avg, (((2,), (0,)), ((), ())), cast=False)
        m2 = dot(x * x, M_avg, (((2,), (0,)), ((), ())), cast=False)
        var = m2 - mean * mean
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias

    dn = d ** -0.5
    strip = qkv_ref[:, 0].astype(ct)                         # [RB, SGS, 3HD]
    means = dot(Pmb, strip, bdims)                           # [RB, wc, 3HD]
    rf_k = dot(means, wk_ref[...], (((2,), (0,)), ((), ())),
               cast=False) + bk_ref[...]
    rf_q = dot(means, wq_ref[...], (((2,), (0,)), ((), ())),
               cast=False) + bq_ref[...]
    if use_ln:
        rf_k = ln(rf_k, lnk_s_ref[...], lnk_b_ref[...])
        rf_q = ln(rf_q, lnq_s_ref[...], lnq_b_ref[...])
    mu = 0.5 * (rf_q + rf_k)                                 # [RB, wc, HD]

    # log phi(k)[n, h] = <mu_c(n), k_n>_h / sqrt(d) - |k_n|_h^2/(2 sqrt(d)):
    # broadcast mu to tokens, take elementwise products against the FULL
    # strip, and reduce per head section with the selector matmuls
    w_tok = dot(PbT, mu, bdims, cast=False)                              # [RB, SGS, HD]
    w_full = jnp.pad(w_tok.astype(ct),
                     ((0, 0), (0, 0), (hd, hd)))             # k-section only
    dash = dn * dot(strip * w_full, S_k, (((2,), (0,)), ((), ())))
    norm = (0.5 * dn) * dot(strip * strip, S_k, (((2,), (0,)), ((), ())))
    logp = dash - norm                                       # [RB, SGS, H]
    # per-chunk stable softmax over member tokens (mask via P, tiny)
    lp_c = jnp.where(Pb[..., None] > 0, logp[:, None], jnp.float32(-1e30))
    m = jnp.max(lp_c, axis=2)                                # [RB, wc, H]
    m_tok = dot(PbT, m, bdims, cast=False)
    p = jnp.exp(logp - m_tok)                                # [RB, SGS, H]
    denom = dot(Pb, p, bdims, cast=False)                                # [RB, wc, H]
    p_lanes = dot(p, S_v, (((2,), (1,)), ((), ())), cast=False)          # [RB, SGS, 3HD]
    pv = dot(Pb, strip * p_lanes.astype(ct), bdims)          # [RB, wc, 3HD]
    # broadcast the per-head denominator across its 64 v-lanes via the
    # (transposed) v-section selector, then divide
    denom_lanes = dot(denom, S_v[2 * hd:, :], (((2,), (1,)), ((), ())),
                      cast=False)
    beta = pv[:, :, 2 * hd:] / denom_lanes

    rf_ref[:, 0] = rf_k.astype(rf_ref.dtype)
    beta_ref[:, 0] = beta.astype(beta_ref.dtype)


def _pick_rb(B: int, sgs: int, three_hd: int, itemsize: int) -> int:
    """Batch rows per step: cap the working set (several [RB, SGS, 3HD]
    temporaries in the compute dtype live concurrently) inside the 16MB
    scoped-VMEM limit; bigger blocks amortize per-step grid overhead."""
    for rb in (32, 16, 8, 4, 2, 1):
        if B % rb == 0 and rb * sgs * three_hd * itemsize <= 2_600_000:
            return rb
    return 1


def supports_summaries(B: int, gh: int, gw: int, j: int,
                       adaptive_proj: str) -> bool:
    return (adaptive_proj in ("default", "no-ln") and j > 0
            and gh % j == 0 and gw % j == 0)


def _block_diag(w: np.ndarray | jax.Array, nh: int) -> jax.Array:
    """[d, d] shared per-head Dense weight -> [H*D, H*D] block diagonal."""
    d = w.shape[0]
    out = jnp.zeros((nh * d, nh * d), jnp.float32)
    for h in range(nh):
        out = out.at[h * d:(h + 1) * d, h * d:(h + 1) * d].set(
            jnp.asarray(w, jnp.float32))
    return out


@functools.partial(jax.jit, static_argnames=(
    "nh", "gw", "j", "use_ln", "interpret"))
def eva_summaries_packed(
    qkv: jax.Array,        # [B, N, 3*H*D] fused projection output
    wq: jax.Array, bq: jax.Array,        # adaptive_mu_q Dense [d,d], [d]
    wk: jax.Array, bk: jax.Array,        # adaptive_mu_k Dense
    lnq_scale: Optional[jax.Array], lnq_bias: Optional[jax.Array],
    lnk_scale: Optional[jax.Array], lnk_bias: Optional[jax.Array],
    *, nh: int, gw: int, j: int, use_ln: bool,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(rf_k_bar, beta)`` packed ``[B, C, H*D]`` (C = hc*wc)."""
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    hd = nh * d
    gh = N // gw
    hc, wc = gh // j, gw // j
    sgs = j * gw
    exact = qkv.dtype == jnp.float32
    rb = _pick_rb(B, sgs, three_hd, 4 if exact else qkv.dtype.itemsize)
    qkv4 = qkv.reshape(B, hc, sgs, three_hd)   # free: contiguous split
    grid = (B // rb, hc)
    qkv_spec = pl.BlockSpec((rb, 1, sgs, three_hd), lambda b, r: (b, r, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((three_hd, hd), lambda b, r: (0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((hd,), lambda b, r: (0,), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rb, 1, wc, hd), lambda b, r: (b, r, 0, 0),
                            memory_space=pltpu.VMEM)
    # big adaptive-Dense operands: block-diagonal per-head weight placed in
    # the q-/k-section rows of a [3HD, HD] matrix so `means @ W` reads the
    # right section with zero slicing
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
    kern = functools.partial(_kernel, nh=nh, d=d, j=j, gw=gw, wc=wc,
                             sgs=sgs, rb=rb, use_ln=use_ln, exact=exact)
    rf, beta = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qkv_spec, w_spec, v_spec, w_spec, v_spec,
                  v_spec, v_spec, v_spec, v_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((B, hc, wc, hd), qkv.dtype),
                   jax.ShapeDtypeStruct((B, hc, wc, hd), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * nh * d * 4,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=B * N * nh,
        ),
        interpret=interpret,
    )(qkv4, wq_big, tile(bq), wk_big, tile(bk),
      tile(lnq_scale), tile(lnq_bias), tile(lnk_scale), tile(lnk_bias))
    C = hc * wc
    return rf.reshape(B, C, hd), beta.reshape(B, C, hd)
