"""Race: packed EVA kernel with MERGED key/value operands vs the shipped one.

RESULT (v5e, DeiT-tiny-p8 geometry): merged 0.757 ms vs separate-dots
0.980 ms (-23%), max abs diff 2e-3 in bf16 (summation reorder) — the merged
form SHIPPED as `eva_packed._kernel` in round 2.  This script remains the
racing record.

Why it wins: the round-2 kernel computed local `[TGS, TGS]` and chunk
`[TGS, C]` logits with separate dots (and a shared max/normalizer) because
concatenating the LOGITS in lanes is not Mosaic-legal for operands at
mismatched lane offsets.  But the K/V OPERANDS can be concatenated along
the *sublane* (row) axis: keys `[TGS + C, D]`, vals `[TGS + C, D]` — one
`[196, 64] x [64, 245]` dot pads lanes to 256 (4% waste) where the separate
chunk dot padded 49 -> 128 (62% waste), and the value dot's K dim goes
196/49 -> 245 (~96% of two 128-passes).  The concat needs matching lane
offsets, achieved by front-padding the summary operands by
`(proj*nh*d) % 128` lanes (first attempt without the pad: Mosaic
'result/input offset mismatch on non-concat dimension').

Usage: python scripts/bench_eva_merged_operands.py  (real TPU)
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E501,E702

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficient_attention_tpu.ops.pallas.eva_packed import (
    _pick_rows,
    _strip_maps,
    _bias_to_token_coords,
    eva_attention_packed,
)
from efficient_attention_tpu.utils.bench_util import timeit_loop

B, N, HD, C, nh, d = 128, 784, 192, 49, 3, 64
W, ws = 28, 7
scale = d ** -0.5


def _merged_kernel(qkv_ref, rf_ref, beta_ref, bias_ref, o_ref,
                   *, scale, nh, d, tgs, c):
    for h in range(nh):
        qh = qkv_ref[:, 0, :, h * d:(h + 1) * d]
        kh = qkv_ref[:, 0, :, (nh + h) * d:(nh + h + 1) * d]
        vh = qkv_ref[:, 0, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
        # rf_ref is front-padded by 64 lanes so each head's slice lands
        # at the same lane offset as kh ((nh+h)*d vs 64+h*d, both mod 128),
        # making the sublane concat Mosaic-legal; beta aligns with vh as-is
        rfh = rf_ref[:, :, d + h * d:d + (h + 1) * d]
        bth = beta_ref[:, :, h * d:(h + 1) * d]
        keys = jnp.concatenate([kh, rfh.astype(kh.dtype)], axis=1)
        vals = jnp.concatenate([vh, bth.astype(vh.dtype)], axis=1)
        logits = jax.lax.dot_general(
            qh, keys, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        # bias covers local columns only; chunk columns get 0
        logits = logits + jnp.pad(bias_ref[h], ((0, 0), (0, c)))[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, 0, :, h * d:(h + 1) * d] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "nh", "W", "ws"))
def merged_fwd(qkv, rf_p, beta_p, bias_big, scale, nh, W, ws):
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    C = rf_p.shape[1]
    RB, TGS = _pick_rows(B, N, W, ws, C)
    ns = N // TGS
    qkv4 = qkv.reshape(B, ns, TGS, three_hd)
    grid = (B // RB, ns)
    qkv_spec = pl.BlockSpec((RB, 1, TGS, three_hd), lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((RB, C, nh * d), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, TGS, TGS), lambda b, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RB, 1, TGS, nh * d), lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_merged_kernel, scale=scale, nh=nh, d=d,
                             tgs=TGS, c=C)
    rf_pad = jnp.pad(rf_p, ((0, 0), (0, 0), (d, 0)))
    cd_pad_spec = pl.BlockSpec((RB, C, d + nh * d), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[qkv_spec, cd_pad_spec, cd_spec, bias_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, ns, TGS, nh * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qkv4, rf_pad, beta_p, bias_big)
    return out.reshape(B, N, nh * d)


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (B, N, 3 * HD)), jnp.bfloat16)
    rf = jnp.asarray(rng.normal(0, 1, (B, C, HD)), jnp.bfloat16)
    bt = jnp.asarray(rng.normal(0, 1, (B, C, HD)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.1, (nh, ws * ws, ws * ws)),
                       jnp.float32)
    _, TGS = _pick_rows(B, N, W, ws, C)
    Rj, mask_add = _strip_maps(W, ws, TGS)
    bias_big = _bias_to_token_coords(bias, Rj) + mask_add

    # timeit_loop feeds the output back as the first input, so tile the
    # [B, N, HD] output back to the qkv shape
    base = lambda q, r, b: jnp.tile(eva_attention_packed(  # noqa: E731
        q, r, b, scale, nh, W, ws, bias=bias).astype(q.dtype), (1, 1, 3))
    merged = lambda q, r, b: jnp.tile(merged_fwd(  # noqa: E731
        q, r, b, bias_big, scale, nh, W, ws).astype(q.dtype), (1, 1, 3))

    o1 = np.asarray(base(qkv, rf, bt), np.float32)
    o2 = np.asarray(merged(qkv, rf, bt), np.float32)
    print("max abs diff:", np.abs(o1 - o2).max())

    print("shipped :", round(timeit_loop(base, qkv, rf, bt), 3), "ms")
    print("merged  :", round(timeit_loop(merged, qkv, rf, bt), 3), "ms")


if __name__ == "__main__":
    main()
