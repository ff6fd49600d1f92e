"""Full-step attribution of the T=512 recipe gap (VERDICT r5 item 3).

Round 4 left a contradiction: the causal-EVA attention MODULE beats
softmax 1.28x at the recipe shape (bf16), yet the full 16L/1024/267k
step loses 8% (205 vs 189.5 ms) — so ~16-24 ms of causal-EVA-only cost
lives outside what ``bench_t512_stages.py`` times.  This script times the
FULL training step (fwd+bwd, adaptive loss) for targeted model variants
so the residual can be attributed line-item:

  softmax                 the reference comparator
  causal_eva              as benched (impl auto)
  causal_eva/xla          kernel disengaged -> kernel contribution
  causal_eva/no-t5        use_t5_rpe=False -> per-layer RPE table cost
  causal_eva/bf16-params  params cast bf16 -> dtype sensitivity of the
                          module-vs-step discrepancy (the module bench
                          raced at bf16; the step runs f32)
  softmax/bf16-params     same cast for the comparator

plus the MODULE alone at f32 (the step's real dtype) — the round-4
module race was bf16-only.

Usage: python scripts/bench_t512_attrib.py
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

import argparse as _ap

import jax
import jax.numpy as jnp

from _bench_util import timeit_loop

B, T = 16, 512


def build(attn, use_t5=True, impl="auto"):
    from efficient_attention_tpu.cli.train_lm import build_model as _bm

    args = _ap.Namespace(
        decoder_embed_dim=1024, decoder_ffn_embed_dim=4096,
        decoder_layers=16, decoder_attention_heads=8,
        attn_name_decoder=attn, dropout=0.0, max_len=T,
        adaptive_cutoffs="20000,60000", criterion="adaptive_loss",
        attn_args_decoder=_ap.Namespace(
            window_size=128, chunk_size=8, adaptive_proj="qk",
            use_t5_rpe=use_t5, causal=True, overlap_window=False,
            impl=impl))
    return _bm(args, vocab_size=267744, dense_tokens=True)


def step_ms(attn, use_t5=True, impl="auto", bf16=False):
    model = build(attn, use_t5=use_t5, impl=impl)
    toks = jnp.ones((B, T), jnp.int32)
    tgts = jnp.ones((B, T), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), toks))()
    if bf16:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)

    def loss(p, t):
        return model.apply(p, t, tgts, method="loss").mean()

    def fwd_bwd(t, p):
        l, g = jax.value_and_grad(loss, argnums=0)(p, t)
        gn = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                 for x in jax.tree_util.tree_leaves(g))
        return t + ((jnp.abs(l) + gn) > 1e30).astype(t.dtype)

    return timeit_loop(fwd_bwd, toks, params, n1=2, n2=7, windows=2)


def module_ms(name, impl="auto", dtype=jnp.float32):
    D, H, Wn, CS = 1024, 8, 128, 8
    if name == "softmax":
        from efficient_attention_tpu.models.transformer import (
            CausalSelfAttention,
        )

        m = CausalSelfAttention(embed_dim=D, num_heads=H, dropout=0.0)
    else:
        from efficient_attention_tpu.attention.causal_eva import (
            CausalEVAttention,
        )

        m = CausalEVAttention(
            embed_dim=D, num_heads=H, window_size=Wn, chunk_size=CS,
            adaptive_proj="qk", use_t5_rpe=True, causal=True, dropout=0.0,
            impl=impl)
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


def main():
    print("== module fwd+bwd at f32 (the step's real dtype) ==", flush=True)
    for label, fn in [
        ("softmax f32", lambda: module_ms("softmax")),
        ("causal auto f32", lambda: module_ms("causal_eva")),
        ("causal xla  f32", lambda: module_ms("causal_eva", impl="xla")),
    ]:
        print(f"{label:24s} {fn():8.3f} ms", flush=True)

    print("== full 16L/1024/267k step fwd+bwd ==", flush=True)
    for label, kw in [
        ("softmax", dict(attn="softmax")),
        ("causal auto", dict(attn="causal_eva")),
        ("causal xla", dict(attn="causal_eva", impl="xla")),
        ("causal no-t5", dict(attn="causal_eva", use_t5=False)),
        ("softmax bf16", dict(attn="softmax", bf16=True)),
        ("causal bf16", dict(attn="causal_eva", bf16=True)),
    ]:
        print(f"{label:24s} {step_ms(**kw):8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
