"""Stage-level timing of the packed EVA module at the bench geometry.

Splits the EVA module (DeiT-tiny-p8: [128, 28, 28, 192], window 7, 49
landmarks) into its pipeline stages to locate the remaining fat vs the
~0.2 ms qkv-traffic floor:

  qkv        x @ W_qkv                       [B, N, 192] -> [B, N, 576]
  summaries  _chunk_summaries_packed (eval + train forms)
  kernel     eva_attention_packed (fused Pallas forward)
  out        attn @ W_out                    [B, N, 192] -> [B, N, 192]
  module     whole EVA module (cross-check: stages should ~sum to it)

Round-2 findings this script drove (numbers on the tunneled v5e):
  * stage-ISOLATED, the 6-D strided-reduce eval summaries (0.87 ms) look
    slower than the matmul form (0.70 ms) — but swapping the eval path to
    the matmul form made the fused module 25% SLOWER (1.66 -> 2.08
    ms/layer: XLA folds the strided-reduce reads into the qkv producer,
    which isolation hides), so eval keeps the 6-D form.  Trust in-module
    numbers over isolated stage numbers;
  * a fused Pallas beta kernel (block-diag membership matmuls, one VMEM
    pass over k/v) measured 0.70 ms vs XLA's 0.57-0.68 ms for the same
    math, i.e. XLA already executes this reduction chain near its MXU
    floor — the kernel was dropped rather than shipped dead;
  * RB=16 for the attention kernel exceeds the 16M scoped-vmem cap
    (20.4M); RB=8 stands.
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E501,E702

import jax
import jax.numpy as jnp

from _bench_util import timeit_loop
from efficient_attention_tpu import AttentionFactory

B, GRID, DIM, NH = 128, 28, 192, 3
EVA_ARGS = {"dim": DIM, "num_heads": NH, "window_size": 7,
            "num_landmarks": 49, "attn_2d": True, "use_rpe": True,
            "adaptive_proj": "default", "impl": "packed"}


def main():
    m = AttentionFactory.build_attention("eva", EVA_ARGS)
    x = jnp.ones((B, GRID, GRID, DIM), jnp.bfloat16)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    N = GRID * GRID
    qkv = jnp.ones((B, N, 3 * DIM), jnp.bfloat16)
    wq = params["params"]["qkv"]["kernel"]
    bq = params["params"]["qkv"]["bias"]
    wo = params["params"]["proj"]["kernel"]
    bo = params["params"]["proj"]["bias"]

    def t(label, fn, first, *args, **kw):
        ms = timeit_loop(fn, first, *args, **kw)
        print(f"{label:24s} {ms:7.3f} ms", flush=True)
        return ms

    xf = x.reshape(B, N, DIM)
    t("qkv proj", lambda c, w, b: (c @ w + b)[:, :, :DIM], xf, wq, bq)
    t("out proj", lambda c, w, b: c @ w + b, xf, wo, bo)

    def summaries(qkv, det):
        rf, beta = m.apply(
            params, qkv, (GRID, GRID), 4, det,
            method=lambda mdl, qkv, ss, j, d: mdl._chunk_summaries_packed(
                qkv, ss, j, d),
            rngs=None if det else {"sample": jax.random.PRNGKey(0)})
        return qkv + (rf.sum() + beta.sum()).astype(qkv.dtype) * 0

    t("summaries (eval form)", lambda c: summaries(c, True), qkv)
    t("summaries (train form)", lambda c: summaries(c, False), qkv)

    from efficient_attention_tpu.ops.pallas.eva_packed import (
        eva_attention_packed,
    )

    rf = jnp.ones((B, 49, DIM), jnp.bfloat16)
    beta = jnp.ones((B, 49, DIM), jnp.bfloat16)
    bias = jnp.ones((NH, 49, 49), jnp.float32)

    def kern(c, rf, beta):
        out = eva_attention_packed(c[:, :, :DIM * 3], rf, beta,
                                   (DIM // NH) ** -0.5, NH, GRID, 7,
                                   bias=bias)
        return jnp.concatenate([out, out, out], axis=-1).astype(c.dtype)

    t("packed kernel (+cat)", kern, qkv, rf, beta)

    def module(c, params):
        return m.apply(params, c, deterministic=True).astype(c.dtype)

    t("full module (eval)", module, x, params)


if __name__ == "__main__":
    main()
