"""Fused Performer/FAVOR+ linear attention: prime maps + KV stats + combine.

The kernelized hot loop (reference ``efficient-attention/efficient_attention/
kernelized_attention.py:20-56,116-121``) materializes the random-feature
prime maps ``q', k' [b, h, n, m]`` in fp32 (~77 MB each at the tracked ViT
geometry B=128, h=3, n=784, m=64) between the qkv projection and the three
linear-attention contractions — the exact "random-feature prime maps" hot
loop BASELINE.json names as a Pallas target.  This kernel streams the packed
``qkv`` from HBM once per batch block and never materializes a prime map:

* grid ``(B//RB, ns)`` with the whole batch element resident (the
  ``lara_fused``/``eva_single`` v3 pattern);
* phase 1 (``pl.when(s == 0)``) makes two VMEM-resident passes over the
  resident strips: pass A finds FAVOR+'s global key stabilizer
  ``max_{n,m} <w, k>`` (``favorp_projection`` ``is_query=False`` uses one
  max over the whole sequence, ``kernelized_attention.py:40-44``), pass B
  accumulates ``kv[m, d] = sum_n k'[n, m] v[n, d]`` and ``z[m] = sum_n k'``
  into persistent scratch;
* each grid step then computes strip ``s``'s queries: the per-token
  stabilized ``q'`` (max over the feature axis only, matching
  ``is_query=True``), ``num = q' @ kv``, ``den = q' @ z``, and
  ``out = num / clip(den, eps)`` (``linear_attention``,
  ``kernelized_attention.py:116-121``; fp32 per ``:345``).

Eval-only by scoping (the train path samples a fresh Gaussian projection
per step whose VJP the XLA path carries); gradients fall back to the exact
VJP of the pure-XLA twin via ``jax.custom_vjp``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST
FEAT_EPS = 1e-4    # favorp_projection eps
DEN_EPS = 1e-2     # linear_attention normalizer clip


def _pick_tgs(N: int):
    """Largest 8-aligned strip size dividing N, capped at 256."""
    for tgs in range(min(N, 256), 7, -8):
        if N % tgs == 0:
            return tgs
    return None


def _pick_rb(B: int, N: int, three_hd: int, tgs: int, m: int,
             itemsize: int):
    hd = three_hd // 3
    for rb in (16, 8, 4, 2, 1):
        if B % rb:
            continue
        total = rb * N * three_hd * itemsize * 2       # resident (x2 pipe)
        total += rb * tgs * hd * itemsize * 2          # out (x2 pipe)
        total += rb * tgs * m * 4 * 4                  # per-strip primes
        total += rb * m * (hd + 128) * 4 * 2           # scratches
        if total <= 48 * 1024 * 1024:
            return rb
    return None


def supports_performer_fused(B: int, N: int, three_hd: int, m: int,
                             itemsize: int = 2) -> bool:
    tgs = _pick_tgs(N)
    if tgs is None or m % 8 or m < 8:
        return False
    return _pick_rb(B, N, three_hd, tgs, m, itemsize) is not None


def _kernel(block_ref, w_ref, o_ref, kv_scr, red_scr,
            *, nh, d, m, tgs, rb, exact):
    """Grid (B//RB, ns): step (b, 0) accumulates KV/z statistics over the
    resident element into scratch; every step (b, s) combines strip s."""
    ns = block_ref.shape[1]
    s_idx = pl.program_id(1)
    prec = HI if exact else jax.lax.Precision.DEFAULT
    ct = jnp.float32 if exact else block_ref.dtype
    dn4 = d ** -0.25
    dn2 = d ** -0.5
    ratio = m ** -0.5

    def dot(a, b, dims):
        return jax.lax.dot_general(a.astype(ct), b.astype(ct), dims,
                                   precision=prec,
                                   preferred_element_type=jnp.float32)

    # [RB,TGS,D] x [M,D] -> [RB,TGS,M]  (shared projection, no batch dim)
    pdims = (((2,), (1,)), ((), ()))
    # [RB,TGS,M] x [RB,TGS,D] -> [RB,M,D]  (contract tokens)
    adims = (((1,), (1,)), ((0,), (0,)))
    # [RB,TGS,M] x [RB,M,D] -> [RB,TGS,D]  (contract features)
    cdims = (((2,), (1,)), ((0,), (0,)))

    @pl.when(s_idx == 0)
    def _phase1():
        for h in range(nh):
            w_h = w_ref[:, h * d:(h + 1) * d]                # [M, D]
            # pass A: FAVOR+ global key stabilizer max_{n,m} <w, k>*dn4
            # (kept rank-3 with single-axis reductions: Mosaic's layout
            # inference rejects the (1,2)-axis reduce + index-squeeze)
            m_k = jnp.full((rb, 1, 1), -1e30, jnp.float32)
            for s in range(ns):
                kh = block_ref[:, s, :, (nh + h) * d:(nh + h + 1) * d]
                dash = dn4 * dot(kh, w_h, pdims)             # [RB,TGS,M]
                m_k = jnp.maximum(m_k, jnp.max(
                    jnp.max(dash, axis=2, keepdims=True),
                    axis=1, keepdims=True))
            # pass B: accumulate kv and z with the stabilized primes
            kv = jnp.zeros((rb, m, d), jnp.float32)
            z = jnp.zeros((rb, m), jnp.float32)
            for s in range(ns):
                kh = block_ref[:, s, :, (nh + h) * d:(nh + h + 1) * d]
                vh = block_ref[:, s, :,
                               (2 * nh + h) * d:(2 * nh + h + 1) * d]
                dash = dn4 * dot(kh, w_h, pdims)
                kf = kh.astype(jnp.float32)
                diag = (0.5 * dn2) * jnp.sum(kf * kf, axis=-1)
                kp = ratio * jnp.exp(
                    dash - diag[:, :, None] - m_k) + FEAT_EPS
                z = z + jnp.sum(kp, axis=1)
                kv = kv + dot(kp, vh, adims)                 # [RB, M, D]
            kv_scr[:, :, h * d:(h + 1) * d] = kv
            red_scr[:, :, h] = z

    # ---- phase 2: strip s's queries ----
    for h in range(nh):
        w_h = w_ref[:, h * d:(h + 1) * d]
        qh = block_ref[:, s_idx, :, h * d:(h + 1) * d]
        dash = dn4 * dot(qh, w_h, pdims)                     # [RB,TGS,M]
        qf = qh.astype(jnp.float32)
        diag = (0.5 * dn2) * jnp.sum(qf * qf, axis=-1)
        stab = jnp.max(dash, axis=-1, keepdims=True)         # per token
        qp = ratio * jnp.exp(dash - diag[:, :, None] - stab) + FEAT_EPS
        kv_h = kv_scr[:, :, h * d:(h + 1) * d]
        num = dot(qp, kv_h, cdims)                           # [RB,TGS,D]
        den = jnp.sum(qp * red_scr[:, :, h][:, None, :], axis=-1)
        out = num / jnp.clip(den, DEN_EPS)[:, :, None]
        o_ref[:, 0, :, h * d:(h + 1) * d] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def _fwd(qkv, w_p, nh, interpret=False):
    B, N, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // nh
    m = w_p.shape[0]
    tgs = _pick_tgs(N)
    ns = N // tgs
    exact = qkv.dtype == jnp.float32
    rb = _pick_rb(B, N, three_hd, tgs, m,
                  4 if exact else qkv.dtype.itemsize)
    qkv4 = qkv.reshape(B, ns, tgs, three_hd)
    grid = (B // rb, ns)
    qkv_spec = pl.BlockSpec((rb, ns, tgs, three_hd),
                            lambda b, s: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((m, hd), lambda b, s: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rb, 1, tgs, hd), lambda b, s: (b, s, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, nh=nh, d=d, m=m, tgs=tgs, rb=rb,
                             exact=exact)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qkv_spec, w_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, ns, tgs, hd), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((rb, m, hd), jnp.float32),
            pltpu.VMEM((rb, m, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * B * nh * N * m * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + B * N * hd * qkv.dtype.itemsize,
            transcendentals=2 * B * nh * N * m,
        ),
        interpret=interpret,
    )(qkv4, w_p)
    return out.reshape(B, N, hd)


def performer_fused_twin(qkv, w_p, *, nh):
    """Pure-XLA functional twin over the same packed operands — the
    custom-vjp backward fallback and the testable statement of the kernel
    math (``favorp_projection`` + ``linear_attention``,
    ``kernelized_attention.py:20-56,116-121``)."""
    from efficient_attention_tpu.ops.random_features import (
        favorp_projection,
        linear_attention,
    )

    B, N, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // nh
    x = qkv.reshape(B, N, 3, nh, d)
    q = jnp.swapaxes(x[:, :, 0], 1, 2)                       # [B, H, N, D]
    k = jnp.swapaxes(x[:, :, 1], 1, 2)
    v = jnp.swapaxes(x[:, :, 2], 1, 2)
    w = w_p.reshape(w_p.shape[0], nh, d).transpose(1, 0, 2)  # [H, M, D]
    qp = favorp_projection(q, w, is_query=True)
    kp = favorp_projection(k, w, is_query=False)
    out = linear_attention(qp.astype(jnp.float32), kp.astype(jnp.float32),
                           v.astype(jnp.float32))
    return jnp.swapaxes(out, 1, 2).reshape(B, N, hd).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused(qkv, w_p, nh, interpret):
    return _fwd(qkv, w_p, nh, interpret=interpret)


def _fused_fwd(qkv, w_p, nh, interpret):
    return _fused(qkv, w_p, nh, interpret), (qkv, w_p)


def _fused_bwd(nh, interpret, res, g):
    _, vjp = jax.vjp(functools.partial(performer_fused_twin, nh=nh), *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def performer_attention_fused(
    qkv: jax.Array,                      # [B, N, 3*H*D] (section-major)
    projection: jax.Array,               # [H, M, D] random-feature matrix
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused FAVOR+ linear attention; returns ``[B, N, H*D]``."""
    h, m, d = projection.shape
    # [H, M, D] -> [M, H*D] (feature-major, per-head column sections)
    w_p = projection.transpose(1, 0, 2).reshape(m, h * d)
    w_p = w_p.astype(jnp.float32)
    return _fused(qkv, w_p, num_heads, interpret)
