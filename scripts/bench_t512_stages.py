"""Stage-time the T=512 recipe step (VERDICT r4 item 3: EVA must not lose
to softmax on the reference's own flagship LM shape).

Times, at the wiki103 recipe geometry (B=16, T=512, d=1024, 8 heads,
window 128, chunk 8):

  1. the ATTENTION MODULE alone, fwd+bwd: CausalEVA auto (packed kernel)
     vs impl='xla' vs exact softmax MHA — isolates the attention delta
     from the 16L/267k-vocab step around it,
  2. the chunk-summary stage alone, fwd+bwd (the per-64-chunk adaptive
     proposal + SNIS machinery the packed kernel still takes from XLA).

Usage: python scripts/bench_t512_stages.py
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

import jax
import jax.numpy as jnp

from _bench_util import timeit_loop

B, T, D, H = 16, 512, 1024, 8
W, CS = 128, 8


def attn_module(name, impl="auto"):
    if name == "softmax":
        from efficient_attention_tpu.models.transformer import (
            CausalSelfAttention,
        )

        return CausalSelfAttention(embed_dim=D, num_heads=H, dropout=0.0)
    from efficient_attention_tpu.attention.causal_eva import (
        CausalEVAttention,
    )

    return CausalEVAttention(
        embed_dim=D, num_heads=H, window_size=W, chunk_size=CS,
        adaptive_proj="qk", use_t5_rpe=True, causal=True, dropout=0.0,
        impl=impl)


def module_ms(name, impl="auto", dtype=jnp.bfloat16):
    m = attn_module(name, impl)
    x = jnp.ones((B, T, D), dtype)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()

    def fwd_bwd(x, p):
        def loss(p, x):
            return jnp.sum(jnp.square(
                m.apply(p, x, deterministic=True).astype(jnp.float32)))

        l, g = jax.value_and_grad(loss)(p, x)
        gn = sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
                 for t in jax.tree_util.tree_leaves(g))
        return x + ((l + gn) > 1e30).astype(x.dtype)

    return timeit_loop(fwd_bwd, x, params, n1=3, n2=13)


def module_fwd_ms(name, impl="auto", dtype=jnp.bfloat16):
    m = attn_module(name, impl)
    x = jnp.ones((B, T, D), dtype)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()

    def fwd(x, p):
        o = m.apply(p, x, deterministic=True).astype(jnp.float32)
        return x + (jnp.sum(jnp.square(o)) > 1e30).astype(x.dtype)

    return timeit_loop(fwd, x, params, n1=3, n2=13)


def summaries_ms(dtype=jnp.bfloat16):
    from flax import linen as nn

    m = attn_module("causal_eva", "xla")
    x = jnp.ones((B, T, D), dtype)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()

    def run(mod, x):
        from efficient_attention_tpu.models.quant_noise import qn_call
        from efficient_attention_tpu.ops import windows as W
        from efficient_attention_tpu.ops.random_features import (
            prm_projection,
        )

        qp = qn_call(mod.q_proj, x, True)
        kp = qn_call(mod.k_proj, x, True)
        vp = qn_call(mod.v_proj, x, True)
        q = jnp.swapaxes(qp.reshape(B, T, H, D // H), 1, 2)
        k = jnp.swapaxes(kp.reshape(B, T, H, D // H), 1, 2)
        v = jnp.swapaxes(vp.reshape(B, T, H, D // H), 1, 2)
        # the module's inline summary stage (causal_eva.py __call__)
        rf_w_q = W.causal_window_1d_partition(q, CS, 0)
        rf_w_k = W.causal_window_1d_partition(k, CS, 0)
        rf_w_v = W.causal_window_1d_partition(v, CS, 0)
        rf_q_bar = mod.adaptive_mu_q(jnp.mean(rf_w_q, axis=-2))
        rf = mod.adaptive_mu_k(jnp.mean(rf_w_k, axis=-2))
        mu = rf_q_bar + rf
        logp = prm_projection(rf_w_k, mu[..., None, :],
                              normalize=False)[..., 0, :]
        beta = jnp.einsum("...cj,...cjd->...cd",
                          jax.nn.softmax(logp, axis=-1), rf_w_v)
        return (jnp.sum(jnp.square(rf.astype(jnp.float32)))
                + jnp.sum(jnp.square(beta.astype(jnp.float32))))

    def fwd_bwd(x, p):
        def loss(p, x):
            return nn.apply(run, m)(p, x)

        l, g = jax.value_and_grad(loss)(p, x)
        gn = sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
                 for t in jax.tree_util.tree_leaves(g))
        return x + ((l + gn) > 1e30).astype(x.dtype)

    return timeit_loop(fwd_bwd, x, params, n1=3, n2=13)


def main():
    global B, T, D, H
    for (B, T, D, H) in [(16, 512, 1024, 8), (4, 2048, 512, 8)]:
        print(f"--- B={B} T={T} d={D} H={H} (window {W} chunk {CS})",
              flush=True)
        for label, fn in [
            ("causal_eva packed ", lambda: module_ms("causal_eva",
                                                     "packed")),
            ("causal_eva xla    ", lambda: module_ms("causal_eva", "xla")),
            ("softmax           ", lambda: module_ms("softmax")),
        ]:
            print(f"attn module fwd+bwd {label} {fn():8.3f} ms", flush=True)
        for label, fn in [
            ("causal_eva packed ", lambda: module_fwd_ms("causal_eva",
                                                         "packed")),
            ("causal_eva xla    ", lambda: module_fwd_ms("causal_eva",
                                                         "xla")),
            ("softmax           ", lambda: module_fwd_ms("softmax")),
        ]:
            print(f"attn module fwd      {label} {fn():8.3f} ms",
                  flush=True)
        try:
            print(f"chunk summaries fwd+bwd        {summaries_ms():8.3f}"
                  " ms", flush=True)
        except Exception as e:  # internal-surface drift; report, don't die
            print("summaries stage timing failed:", e)


if __name__ == "__main__":
    main()
