"""LM perplexity evaluation with sliding context windows.

``fairseq_cli/eval_lm.py`` equivalent: scores a binarized corpus at
``--context-window {0,256,480}`` (the wiki103 protocol, ``main.sh:84-124``)
using the parallel causal-EVA path for full-block scoring.
"""
from __future__ import annotations

import argparse
import json
import math
import os

import numpy as np

from efficient_attention_tpu.cli.train_lm import build_model, build_parser


def parse_args(argv=None):
    from efficient_attention_tpu import AttentionFactory, NestedNamespace

    parser = build_parser()
    parser.add_argument("--context-window", type=int, default=0)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--split", default="test")
    parser.add_argument("--eval-max-batch", type=int, default=32)
    known, _ = parser.parse_known_args(argv)
    parser = AttentionFactory.add_attn_specific_args(
        parser, known.attn_name_decoder, struct_name="attn_args_decoder",
        prefix="decoder-attn")
    parser.add_argument("--help", action="help")
    return parser.parse_args(argv, namespace=NestedNamespace())


def load_eval_corpus(args):
    if args.dummy_data or not args.data:
        rng = np.random.default_rng(args.seed + 1)
        return (rng.integers(4, args.dummy_vocab, size=args.max_tokens * 8)
                .astype(np.int64), None, args.dummy_vocab)
    from efficient_attention_tpu.data.dictionary import Dictionary
    from efficient_attention_tpu.data.indexed_dataset import MMapIndexedDataset

    d = Dictionary.load(os.path.join(args.data, "dict.txt"))
    ds = MMapIndexedDataset(os.path.join(args.data, args.split))
    return ds.flat_tokens(), d, len(d)


def main(args) -> dict:
    import jax
    import jax.numpy as jnp

    from efficient_attention_tpu.data.lm_context_window import (
        context_window_blocks,
    )
    from efficient_attention_tpu.training import CheckpointManager
    from efficient_attention_tpu.training.lm_steps import make_lm_eval_step

    tokens, dictionary, vocab_size = load_eval_corpus(args)
    model = build_model(args, vocab_size)
    dummy = jnp.zeros((1, args.tokens_per_sample), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), dummy))()
    if args.checkpoint:
        # params-only restore: eval doesn't know (or need) the training
        # optimizer's state structure
        mgr = CheckpointManager(os.path.abspath(args.checkpoint))
        restored = mgr.restore_params()
        if restored is not None:
            step_loaded, params = restored
            print(f"| loaded checkpoint step {int(step_loaded)}")

    eval_step = jax.jit(
        make_lm_eval_step(use_adaptive=model.adaptive_cutoffs is not None),
        static_argnums=(1,))

    # tokens_per_sample shrinks by the context window (``eval_lm.py:244-246``)
    block_len = args.tokens_per_sample
    blocks, masks = [], []
    total_nll, total_tok = 0.0, 0.0
    stream = list(context_window_blocks(
        tokens, block_len + 1, args.context_window, pad_idx=1))

    def flush():
        nonlocal total_nll, total_tok, blocks, masks
        if not blocks:
            return
        arr = np.stack(blocks)
        msk = np.stack(masks)
        nll, n = eval_step(params, model.apply,
                           jnp.asarray(arr[:, :-1]), jnp.asarray(arr[:, 1:]),
                           jnp.asarray(msk[:, 1:]))
        total_nll += float(nll)
        total_tok += float(n)
        blocks, masks = [], []

    for block, mask in stream:
        blocks.append(block)
        masks.append(mask)
        if len(blocks) == args.eval_max_batch:
            flush()
    flush()
    nll = total_nll / max(total_tok, 1)
    result = {
        "nll_loss_base_e": nll,
        "loss_base_2": nll / math.log(2),
        "ppl": math.exp(min(nll, 30)),
        "tokens": total_tok,
        "context_window": args.context_window,
    }
    print(f"| Evaluated {int(total_tok)} tokens, context window "
          f"{args.context_window}: loss {nll:.4f}, ppl {result['ppl']:.2f}")
    print(json.dumps(result))
    return result


def cli_main(argv=None):
    return main(parse_args(argv))


if __name__ == "__main__":
    cli_main()
