"""Attribute the mt_generate EVA-vs-softmax gap at the device level.

BENCH `mt_generate` measures the full jitted beam search (batch 8, beam 4,
wmt_en_de shape, main.sh:170-176 protocol); round 5 measured EVA 617.7 vs
softmax 668.6 tokens/sec (0.92x).  This script splits one generator
iteration into its two device costs so the gap is attributable:

* ``decode_step``: the jitted 6-layer decoder incremental step alone
  ([B*K, 1] token -> logits) at a mid-buffer position, per attention;
* ``beam iteration``: the full per-position cost inferred from a
  fixed-length generate run (``buf_len`` iterations), i.e. decode_step +
  log-softmax/top-k/reorder beam machinery (attention-independent).

The hypothesis under test: causal-EVA's per-step summary-state update is
a fixed cost that cannot amortize at WMT sentence lengths (~30 tokens,
window 16 / chunk 8), while its decode win appears at long contexts
(BENCH ``lm_decode_step``: 4.3x at a T=2048 cache).

Usage: python scripts/bench_mt_decode_attrib.py
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

import time

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timeit_loop
from efficient_attention_tpu.generation.beam_search import SequenceGenerator
from efficient_attention_tpu.models.transformer import TransformerModel

V, Bm, SRC, K = 32768, 8, 24, 4


def build(attn):
    if attn == "eva":
        enc_name, dec_name = "eva", "causal_eva"
        enc_args = {"window_size": 8, "num_landmarks": 8, "attn_2d": False,
                    "overlap_window": True, "use_t5_rpe": True,
                    "use_rpe": False, "adaptive_proj": "no-ln"}
        dec_args = {"window_size": 16, "chunk_size": 8,
                    "adaptive_proj": "qk", "use_t5_rpe": True,
                    "causal": True}
    else:
        enc_name = dec_name = "softmax"
        enc_args = dec_args = {}
    model = TransformerModel(
        src_vocab_size=V, tgt_vocab_size=V,
        attn_name_encoder=enc_name, attn_args_encoder=enc_args,
        attn_name_decoder=dec_name, attn_args_decoder=dec_args,
        dropout=0.0, max_len=256, share_all_embeddings=True)
    src = jnp.full((Bm, SRC), 5, jnp.int32)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), src[:1], src[:1, :4]))()
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params)
    enc_out, enc_pad = model.apply(params, src,
                                   method=TransformerModel.encode)
    enc_out_k = jnp.repeat(enc_out, K, axis=0)
    enc_pad_k = jnp.repeat(enc_pad, K, axis=0)
    return model, params, enc_out_k, enc_pad_k


def measure(attn):
    model, params, enc_out_k, enc_pad_k = build(attn)
    buf_len = SRC + 50 + 2
    buf_len += (-buf_len) % 16

    # ---- decode_step alone (mid-buffer position) ----
    cache = model.apply(params, Bm * K, buf_len, jnp.bfloat16, enc_out_k,
                        method=TransformerModel.init_decode_state)
    tokens = jnp.full((Bm * K, 1), 5, jnp.int32)
    pos = jnp.int32(16)

    def step(cache, tokens):
        logits, new_cache = model.apply(
            params, cache, tokens, pos, None, enc_pad_k,
            method=TransformerModel.decode_step)
        return logits[:, 0].astype(jnp.float32)

    step_ms = timeit_loop(step, cache, tokens)

    # ---- full fixed-length generate (per-iteration cost) ----
    def step_fn(ctx, cache, tokens, step_i):
        p, _, pad_k = ctx
        logits, cache = model.apply(
            p, cache, tokens, step_i, None, pad_k,
            method=TransformerModel.decode_step)
        return logits[:, 0], cache

    def init_cache(ctx, bk, max_len):
        p, out_k, _ = ctx
        return model.apply(p, bk, max_len, jnp.bfloat16, out_k,
                           method=TransformerModel.init_decode_state)

    gen = SequenceGenerator(step_fn, init_cache, vocab_size=V, beam_size=K,
                            max_len=buf_len, len_penalty=0.6,
                            max_len_a=1.0, max_len_b=50)
    lens = jnp.full((Bm,), SRC, jnp.int32)
    ctx = (params, enc_out_k, enc_pad_k)
    toks, _ = gen.generate(batch=Bm, src_lengths=lens, ctx=ctx)
    np.asarray(toks)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        toks, _ = gen.generate(batch=Bm, src_lengths=lens, ctx=ctx)
        np.asarray(toks)
        best = min(best, time.perf_counter() - t0)
    # the loop runs at most buf_len-1 positions; with random params hyps
    # rarely finish early, so per-iteration = total / (buf_len-1) is an
    # upper-bound-tight estimate
    iter_ms = 1e3 * best / (buf_len - 1)
    return step_ms, iter_ms, buf_len


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rows = {}
    for attn in ("softmax", "eva"):
        step_ms, iter_ms, buf_len = measure(attn)
        rows[attn] = (step_ms, iter_ms)
        print(f"[{attn:8s}] decode_step {step_ms:6.3f} ms | full beam "
              f"iteration {iter_ms:6.3f} ms | beam machinery "
              f"{iter_ms - step_ms:6.3f} ms  (buf_len={buf_len})",
              flush=True)
    d_step = rows["eva"][0] - rows["softmax"][0]
    d_iter = rows["eva"][1] - rows["softmax"][1]
    print(f"EVA-vs-softmax delta: decode_step {d_step:+.3f} ms/pos, "
          f"iteration {d_iter:+.3f} ms/pos -> "
          f"{100 * d_step / max(d_iter, 1e-9):.0f}% of the e2e gap is the "
          f"decoder step (summary-state update at short T)", flush=True)


if __name__ == "__main__":
    main()
