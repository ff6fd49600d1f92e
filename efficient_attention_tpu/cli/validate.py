"""Validation-loss CLI — ``fairseq_cli/validate.py`` equivalent: loads a
checkpoint and reports loss/ppl on a validation split (MT or LM)."""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def cli_main(argv=None):
    base = argparse.ArgumentParser("eatpu-validate", add_help=False)
    base.add_argument("--task", choices=["lm", "mt"], default="lm")
    known, rest = base.parse_known_args(argv)
    if known.task == "lm":
        from efficient_attention_tpu.cli import eval_lm

        args = eval_lm.parse_args(rest)
        args.split = "valid"
        return eval_lm.main(args)

    # MT validation: label-smoothed loss over the valid split
    import jax
    import jax.numpy as jnp

    from efficient_attention_tpu.cli.generate import load_params
    from efficient_attention_tpu.cli.train_mt import (
        build_model,
        build_parser,
        load_pairs,
    )
    from efficient_attention_tpu import AttentionFactory, NestedNamespace
    from efficient_attention_tpu.data.text_data import collate_tokens
    from efficient_attention_tpu.training.criterions import (
        label_smoothed_nll_loss,
    )

    parser = build_parser()
    parser.add_argument("--path", default=None)
    parser.add_argument("--num-avg-checkpoints", type=int, default=1)
    parser.add_argument("--valid-subset-size", type=int, default=64)
    k2, _ = parser.parse_known_args(rest)
    parser = AttentionFactory.add_attn_specific_args(
        parser, k2.attn_name_encoder, struct_name="attn_args_encoder",
        prefix="encoder-attn")
    parser = AttentionFactory.add_attn_specific_args(
        parser, k2.attn_name_decoder, struct_name="attn_args_decoder",
        prefix="decoder-attn")
    args = parser.parse_args(rest, namespace=NestedNamespace())

    src, tgt, sd, td = load_pairs(args)
    src_vocab = len(sd) if sd else args.dummy_vocab
    tgt_vocab = len(td) if td else args.dummy_vocab
    model = build_model(args, src_vocab, tgt_vocab)
    dummy = jnp.zeros((1, 16), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), dummy, dummy))()
    params = load_params(args, model, params)

    total_loss, total_nll, total_tok = 0.0, 0.0, 0.0
    ids = list(range(min(len(src), args.valid_subset_size)))
    fwd = jax.jit(lambda p, s, pr: model.apply(p, s, pr, deterministic=True))
    for i in range(0, len(ids), 16):
        chunk = ids[i:i + 16]
        src_b = collate_tokens([src[j] for j in chunk], pad_idx=1)
        tgt_b = collate_tokens([tgt[j] for j in chunk], pad_idx=1)
        prev_b = collate_tokens([tgt[j] for j in chunk], pad_idx=1,
                                move_eos_to_beginning=True)
        logits = fwd(params, jnp.asarray(src_b), jnp.asarray(prev_b))
        loss, nll, n = label_smoothed_nll_loss(
            logits, jnp.asarray(tgt_b), args.label_smoothing, pad_idx=1)
        total_loss += float(loss)
        total_nll += float(nll)
        total_tok += float(n)
    import math

    result = {"valid_loss": total_loss / max(total_tok, 1),
              "valid_nll": total_nll / max(total_tok, 1),
              "valid_ppl": math.exp(min(total_nll / max(total_tok, 1), 30)),
              "tokens": total_tok}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    cli_main()
