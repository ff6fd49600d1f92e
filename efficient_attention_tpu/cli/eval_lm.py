"""LM perplexity evaluation with sliding context windows.

``fairseq_cli/eval_lm.py`` equivalent: scores a binarized corpus at
``--context-window {0,256,480}`` (the wiki103 protocol, ``main.sh:84-124``)
using the parallel causal-EVA path for full-block scoring.
"""
from __future__ import annotations

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
    parser.add_argument("--softmax-batch", type=int, default=0,
                        help="cap on tokens whose vocab softmax "
                             "materializes per device call (fairseq "
                             "--softmax-batch; 0 = unbounded; the "
                             "adaptive-loss path already streams the "
                             "vocab regardless)")
    parser.add_argument("--output-word-probs", action="store_true",
                        help="print per-word log-probs for every scored "
                             "sample (fairseq --output-word-probs)")
    parser.add_argument("--output-word-stats", action="store_true",
                        help="print per-word aggregate stats sorted by "
                             "count (fairseq --output-word-stats WordStat)")
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
    from efficient_attention_tpu.training.checkpoint import (
        parse_layers_to_keep,
        prune_layer_params,
    )
    from efficient_attention_tpu.training.lm_steps import (
        make_lm_eval_step,
        make_lm_token_nll_step,
    )

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
            keep = parse_layers_to_keep(
                getattr(args, "decoder_layers_to_keep", None))
            if keep:
                # full-depth checkpoint -> pruned model (fairseq
                # prune_state_dict, LayerDrop inference-time pruning)
                params = prune_layer_params(params, keep, "decoder")
                print(f"| pruned decoder to layers {keep}")

    use_adaptive = model.adaptive_cutoffs is not None
    # --softmax-batch bounds live logits to [softmax_batch, V] inside the
    # step (fairseq batch_for_softmax splits within a batch over time;
    # row slicing alone cannot honor the cap when softmax_batch < T,
    # ADVICE r3). The adaptive NLL already streams the vocab.
    softmax_chunk = (int(args.softmax_batch)
                     if args.softmax_batch and not use_adaptive
                     and args.softmax_batch < 2 ** 30 else None)
    eval_step = jax.jit(
        make_lm_eval_step(use_adaptive=use_adaptive,
                          softmax_chunk=softmax_chunk),
        static_argnums=(1,))
    want_words = args.output_word_probs or args.output_word_stats
    token_step = (jax.jit(make_lm_token_nll_step(use_adaptive=use_adaptive,
                                                 softmax_chunk=softmax_chunk),
                          static_argnums=(1,)) if want_words else None)
    word_stats = {}
    sample_idx = 0

    def token_str(t):
        return dictionary[int(t)] if dictionary is not None else str(int(t))

    # tokens_per_sample shrinks by the context window (``eval_lm.py:244-246``)
    block_len = args.tokens_per_sample
    blocks, masks = [], []
    total_nll, total_tok = 0.0, 0.0
    stream = list(context_window_blocks(
        tokens, block_len + 1, args.context_window, pad_idx=1))

    def flush():
        nonlocal total_nll, total_tok, blocks, masks, sample_idx
        if not blocks:
            return
        arr = np.stack(blocks)
        msk = np.stack(masks)
        # --softmax-batch: bound the [rows, T, V] logits materialization by
        # scoring row slices (fairseq SequenceScorer batch_for_softmax)
        rows = arr.shape[0]
        if args.softmax_batch and not use_adaptive:
            rows = max(1, args.softmax_batch // max(arr.shape[1] - 1, 1))
        for lo in range(0, arr.shape[0], rows):
            a, m = arr[lo: lo + rows], msk[lo: lo + rows]
            tok = jnp.asarray(a[:, :-1])
            tgt = jnp.asarray(a[:, 1:])
            sm = jnp.asarray(m[:, 1:])
            nll, n = eval_step(params, model.apply, tok, tgt, sm)
            total_nll += float(nll)
            total_tok += float(n)
            if token_step is not None:
                tnll, tmask = token_step(params, model.apply, tok, tgt, sm)
                tnll, tmask = np.asarray(tnll), np.asarray(tmask)
                for r in range(a.shape[0]):
                    pieces = []
                    for t in range(tnll.shape[1]):
                        if not tmask[r, t]:
                            continue
                        w = token_str(a[r, 1 + t])
                        lp = -float(tnll[r, t])
                        if args.output_word_probs:
                            pieces.append(f"{w} [{lp:.4f}]")
                        cnt, tot = word_stats.get(w, (0, 0.0))
                        word_stats[w] = (cnt + 1, tot + lp)
                    if args.output_word_probs and pieces:
                        print(f"W-{sample_idx}\t" + " ".join(pieces))
                    sample_idx += 1
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
    if args.output_word_stats:
        # fairseq WordStat dump: word, count, avg log-prob, sorted by count
        for w, (cnt, tot) in sorted(word_stats.items(),
                                    key=lambda kv: -kv[1][0]):
            print(f"{w} | count {cnt} | avg_log_prob {tot / cnt:.4f}")
    print(f"| Evaluated {int(total_tok)} tokens, context window "
          f"{args.context_window}: loss {nll:.4f}, ppl {result['ppl']:.2f}")
    print(json.dumps(result))
    return result


def cli_main(argv=None):
    return main(parse_args(argv))


if __name__ == "__main__":
    cli_main()
