"""Microbenchmark: EVA fused-kernel variants at the bench geometry.

Races the round-1 dense TG=8 kernel against padded-window (S 49->56)
designs that cut the masked MXU/VPU waste, on the real TPU. Variants:

  current         round-1 dense block-diag TG=8 kernel
  xla             pure-XLA reference path
  padN_rbM        padded S=56, TG=N windows/step batched dot, RB=M
  splitN_rbM      padded S=56, chunk logits via ONE dense [TGS, C] matmul,
                  local via batched per-window [56,56] matmuls

Timing: dependency-chain + single host fetch (block_until_ready is a no-op
over the axon tunnel), best of 3 windows.

Usage: python scripts/bench_eva_kernel_variants.py
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficient_attention_tpu.ops.pallas.eva_kernel import (
    MASK_VAL,
    _xla_reference,
    eva_attention_fused,
)

B, H, G, S, C, D = 128, 3, 16, 49, 49, 64
SP = 56  # padded window size (multiple of 8)
ITERS = 20


# ---------------------------------------------------------------- variants
def _pad_kernel(q_ref, k_ref, v_ref, rf_ref, beta_ref, bias_ref, o_ref,
                *, scale, s, c, tg, rb):
    d = q_ref.shape[-1]
    qq = q_ref[:, 0].reshape(rb * tg, s, d)
    kk = k_ref[:, 0].reshape(rb * tg, s, d)
    vv = v_ref[:, 0].reshape(rb * tg, s, d)
    rr = rf_ref[:, 0]  # [RB, C, D]
    bt = beta_ref[:, 0]
    rr_b = jnp.broadcast_to(rr[:, None], (rb, tg, c, d)).reshape(rb * tg, c, d)
    bt_b = jnp.broadcast_to(bt[:, None], (rb, tg, c, d)).reshape(rb * tg, c, d)
    keys = jnp.concatenate([kk, rr_b], axis=1)  # [RB*TG, S+C, D]
    vals = jnp.concatenate([vv, bt_b], axis=1)
    logits = jax.lax.dot_general(
        qq, keys, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [RB*TG, S, S+C]
    logits = logits + bias_ref[0][None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = out / denom
    o_ref[:, 0] = out.reshape(rb, tg * s, d).astype(o_ref.dtype)


def _split_kernel(q_ref, k_ref, v_ref, rf_ref, beta_ref, bias_ref, o_ref,
                  *, scale, s, c, tg, rb):
    d = q_ref.shape[-1]
    q2 = q_ref[:, 0]  # [RB, TGS, D]
    qq = q2.reshape(rb * tg, s, d)
    kk = k_ref[:, 0].reshape(rb * tg, s, d)
    vv = v_ref[:, 0].reshape(rb * tg, s, d)
    rr = rf_ref[:, 0]  # [RB, C, D]
    bt = beta_ref[:, 0]
    # chunk logits: ONE dense [TGS, C] matmul per batch row (fully useful)
    chunk = jax.lax.dot_general(
        q2, rr, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [RB, TGS, C]
    local = jax.lax.dot_general(
        qq, kk, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [RB*TG, S, S]
    logits = jnp.concatenate(
        [local, chunk.reshape(rb * tg, s, c)], axis=-1)  # [RB*TG, S, S+C]
    logits = logits + bias_ref[0][None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(vv.dtype)
    out_local = jax.lax.dot_general(
        p[..., :s], vv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [RB*TG, S, D]
    p_chunk = p[..., s:].reshape(rb, tg * s, c)
    out_chunk = jax.lax.dot_general(
        p_chunk, bt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [RB, TGS, D]
    out = out_local.reshape(rb, tg * s, d) + out_chunk
    o_ref[:, 0] = out.astype(o_ref.dtype)


def _padded_call(kernel_body, w_q, w_k, w_v, rf, beta, bias, scale, tg, rb):
    """Pad windows S->SP, run the padded kernel, slice back."""
    pad = ((0, 0), (0, 0), (0, 0), (0, SP - S), (0, 0))
    qp = jnp.pad(w_q, pad)
    kp = jnp.pad(w_k, pad)
    vp = jnp.pad(w_v, pad)
    # bias [H, SP, SP + C]: RPE on the real block, MASK_VAL on padded keys
    bias_p = jnp.full((H, SP, SP), MASK_VAL, jnp.float32)
    bias_p = bias_p.at[:, :, :S].set(0.0)
    bias_p = bias_p.at[:, :S, :S].set(bias.astype(jnp.float32))
    bias_p = jnp.pad(bias_p, ((0, 0), (0, 0), (0, C)))  # chunk cols bias 0

    q2 = qp.reshape(B, H, G * SP, D)
    k2 = kp.reshape(B, H, G * SP, D)
    v2 = vp.reshape(B, H, G * SP, D)
    tgs = tg * SP
    grid = (H, B // rb, G // tg)
    row_spec = pl.BlockSpec((rb, 1, tgs, D), lambda h, b, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((rb, 1, C, D), lambda h, b, j: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, SP, SP + C), lambda h, b, j: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    kern = functools.partial(kernel_body, scale=scale, s=SP, c=C, tg=tg,
                             rb=rb)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, cd_spec, cd_spec, bias_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(q2.shape, w_q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(q2, k2, v2, rf, beta, bias_p)
    return out.reshape(B, H, G, SP, D)[:, :, :, :S]


# ---------------------------------------------------------------- harness
from _bench_util import timeit_loop as timeit


def main():
    rng = np.random.default_rng(0)
    scale = D ** -0.5
    w_q = jnp.asarray(rng.normal(size=(B, H, G, S, D)), jnp.bfloat16)
    w_k = jnp.asarray(rng.normal(size=(B, H, G, S, D)), jnp.bfloat16)
    w_v = jnp.asarray(rng.normal(size=(B, H, G, S, D)), jnp.bfloat16)
    rf = jnp.asarray(rng.normal(size=(B, H, C, D)), jnp.bfloat16)
    beta = jnp.asarray(rng.normal(size=(B, H, C, D)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, S, S)) * 0.1, jnp.float32)

    ref = jax.jit(functools.partial(_xla_reference, scale=scale))(
        w_q, w_k, w_v, rf, beta, bias)

    results = {}
    results["xla"] = timeit(
        lambda *a: _xla_reference(*a, scale=scale), w_q, w_k, w_v, rf, beta,
        bias)
    results["current_tg8"] = timeit(
        lambda *a: eva_attention_fused(*a[:5], scale, a[5]),
        w_q, w_k, w_v, rf, beta, bias)

    for name, body in (("pad", _pad_kernel), ("split", _split_kernel)):
        for tg in (1, 2, 4):
            for rb in (4, 8):
                key = f"{name}{tg}_rb{rb}"
                try:
                    fn = functools.partial(
                        _padded_call, body, scale=scale, tg=tg, rb=rb)
                    out = jax.jit(
                        lambda *a, fn=fn: fn(*a))(
                            w_q, w_k, w_v, rf, beta, bias)
                    err = float(jnp.max(jnp.abs(
                        out.astype(jnp.float32) - ref.astype(jnp.float32))))
                    t = timeit(fn, w_q, w_k, w_v, rf, beta, bias)
                    results[key] = t
                    print(f"{key:16s} {t:7.3f} ms  maxerr={err:.4f}",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{key:16s} FAILED: {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)

    print("\n=== summary (ms/call, lower better) ===")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"{k:16s} {v:7.3f}")


if __name__ == "__main__":
    main()
