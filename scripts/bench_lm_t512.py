"""LM train-step at the ACTUAL wikitext-103 recipe shape (VERDICT r3 item 4).

Recipe (reference main.sh:75-124): transformer_lm_wiki103 (16L, d=1024,
ffn=4096, 8 heads), --tokens-per-sample 512, --max-tokens 9216, criterion
adaptive_loss (cutoffs 20000,60000), wiki103 vocab 267744.  Round 2 benched
T=2048 with a dense 32k-vocab CE instead; this script measures the real
geometry, plus the per-stage FLOPs shares that bound any attention speedup.
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import argparse as _ap

import jax
import jax.numpy as jnp
import optax

from _bench_util import timeit_loop
from efficient_attention_tpu.cli.train_lm import build_model

VOCAB = 267744
T = 512
BATCH = 16  # 8192 tokens/microbatch (max-tokens 9216)


def lm_model(attn, adaptive=True):
    args = _ap.Namespace(
        decoder_embed_dim=1024, decoder_ffn_embed_dim=4096,
        decoder_layers=16, decoder_attention_heads=8,
        attn_name_decoder=attn, dropout=0.0, max_len=T,
        adaptive_cutoffs="20000,60000" if adaptive else None,
        criterion="adaptive_loss" if adaptive else "cross_entropy",
        attn_args_decoder=_ap.Namespace(
            window_size=128, chunk_size=8, adaptive_proj="qk",
            use_t5_rpe=True, causal=True, overlap_window=False))
    return build_model(args, vocab_size=VOCAB)


def train_ms(attn, adaptive=True):
    model = lm_model(attn, adaptive)
    toks = jnp.ones((BATCH, T), jnp.int32)
    tgts = jnp.ones((BATCH, T), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), toks))()

    if adaptive:
        def loss(p, t):
            nll = model.apply(p, t, tgts, method="loss")
            return nll.mean()
    else:
        def loss(p, t):
            return optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, t), tgts).mean()

    def fwd_bwd(t, p):
        l, g = jax.value_and_grad(loss, argnums=0)(p, t)
        gn = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                 for x in jax.tree_util.tree_leaves(g))
        return t + ((jnp.abs(l) + gn) > 1e30).astype(t.dtype)

    return timeit_loop(fwd_bwd, toks, params, n1=2, n2=7, windows=2)


def main():
    for attn in ("causal_eva", "softmax"):
        ms = train_ms(attn, adaptive=True)
        print(f"t512 adaptive {attn:12s} {ms:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
