"""Prototype: packed EVA kernel + out-projection via VMEM scratch.

The first proj-fold attempt (per-head [RB,TGS,64]@[64,192] accumulation)
measured SLOWER than the separate XLA proj. This variant writes each head's
attention output into a VMEM scratch ref and applies ONE batched
[TGS,HD]@[HD,HD] matmul at the end. Race against the committed kernel.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "scripts")
from _bench_util import timeit_loop  # noqa: E402

from efficient_attention_tpu.ops.pallas.eva_packed import (  # noqa: E402
    MASK_VAL,
    _rowmajor_vis,
    eva_attention_packed,
)

B, N, HD, C, nh, d = 128, 784, 192, 49, 3, 64
W, ws = 28, 7
TGS, RB = 196, 4
scale = d ** -0.5


def _kernel(qkv_ref, rf_ref, beta_ref, bias_ref, wout_ref, bout_ref, o_ref,
            scratch_ref):
    for h in range(nh):
        qh = qkv_ref[:, 0, :, h * d:(h + 1) * d]
        kh = qkv_ref[:, 0, :, (nh + h) * d:(nh + h + 1) * d]
        vh = qkv_ref[:, 0, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
        rfh = rf_ref[:, :, h * d:(h + 1) * d]
        bth = beta_ref[:, :, h * d:(h + 1) * d]
        local = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + bias_ref[h][None]
        chunk = jax.lax.dot_general(
            qh, rfh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.maximum(jnp.max(local, -1, keepdims=True),
                        jnp.max(chunk, -1, keepdims=True))
        p_l = jnp.exp(local - m)
        p_c = jnp.exp(chunk - m)
        denom = (jnp.sum(p_l, -1, keepdims=True)
                 + jnp.sum(p_c, -1, keepdims=True))
        out = jax.lax.dot_general(
            p_l.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out = out + jax.lax.dot_general(
            p_c.astype(bth.dtype), bth, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        scratch_ref[:, :, h * d:(h + 1) * d] = \
            (out / denom).astype(scratch_ref.dtype)
    attn = scratch_ref[...]  # [RB, TGS, HD] fresh ref read, offset 0
    proj = jax.lax.dot_general(
        attn, wout_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = (proj + bout_ref[...][None, None]).astype(o_ref.dtype)


@jax.jit
def fused(qkv, rf, bt, bias_big, wout, bout):
    ns = N // TGS
    qkv4 = qkv.reshape(B, ns, TGS, 3 * HD)
    grid = (B // RB, ns)
    qs = pl.BlockSpec((RB, 1, TGS, 3 * HD), lambda b, j: (b, j, 0, 0),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((RB, C, HD), lambda b, j: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((nh, TGS, TGS), lambda b, j: (0, 0, 0),
                      memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((HD, HD), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((HD,), lambda b, j: (0,), memory_space=pltpu.VMEM)
    os_ = pl.BlockSpec((RB, 1, TGS, HD), lambda b, j: (b, j, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel, grid=grid,
        in_specs=[qs, cs, cs, bs, wspec, bspec], out_specs=os_,
        out_shape=jax.ShapeDtypeStruct((B, ns, TGS, HD), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((RB, TGS, HD), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qkv4, rf, bt, bias_big, wout, bout)
    return out.reshape(B, N, HD)


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * HD)), jnp.bfloat16)
    rf = jnp.asarray(rng.normal(size=(B, C, HD)), jnp.bfloat16)
    bt = jnp.asarray(rng.normal(size=(B, C, HD)), jnp.bfloat16)
    wout = jnp.asarray(rng.normal(size=(HD, HD)) * 0.05, jnp.bfloat16)
    bout = jnp.asarray(rng.normal(size=(HD,)) * 0.05, jnp.bfloat16)
    vis = _rowmajor_vis(W, ws, TGS)
    bias_big = jnp.broadcast_to(
        jnp.asarray(np.where(vis, 0.0, MASK_VAL), jnp.float32),
        (nh, TGS, TGS))

    # correctness vs kernel+XLA proj
    ref = (eva_attention_packed(qkv, rf, bt, scale, nh, W, ws, bias=None)
           @ wout + bout)
    out = fused(qkv, rf, bt, bias_big, wout, bout)
    print("maxerr:", float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)))))

    def base(qkv, rf, bt):
        o = eva_attention_packed(qkv, rf, bt, scale, nh, W, ws, bias=None)
        return jnp.concatenate([o @ wout + bout] * 3, -1)

    def fast(qkv, rf, bt):
        return jnp.concatenate([fused(qkv, rf, bt, bias_big, wout, bout)] * 3,
                               -1)

    print("kernel + xla proj:", round(timeit_loop(base, qkv, rf, bt), 3),
          "ms")
    print("proj-fused scratch:", round(timeit_loop(fast, qkv, rf, bt), 3),
          "ms")


if __name__ == "__main__":
    main()
