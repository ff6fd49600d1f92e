"""Interactive translation from stdin — ``fairseq_cli/interactive.py``
equivalent: tokenize with the source dictionary, beam-decode, detokenize."""
from __future__ import annotations

import os
import sys

from efficient_attention_tpu.cli.generate import parse_args
from efficient_attention_tpu.cli.train_mt import build_model


def cli_main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_attention_tpu.cli.generate import load_params
    from efficient_attention_tpu.data.dictionary import Dictionary
    from efficient_attention_tpu.data.text_data import collate_tokens
    from efficient_attention_tpu.generation import SequenceGenerator
    from efficient_attention_tpu.models.transformer import TransformerModel

    from efficient_attention_tpu.data.encoders import (
        build_bpe,
        build_tokenizer,
    )

    args = parse_args(argv)
    assert args.data, "interactive mode requires --data with dictionaries"
    sd = Dictionary.load(os.path.join(args.data, f"dict.{args.source_lang}.txt"))
    td = Dictionary.load(os.path.join(args.data, f"dict.{args.target_lang}.txt"))
    # raw-text input path (fairseq_cli/interactive.py encode_fn): tokenizer
    # then BPE before dictionary lookup, both reversed on output
    bpe = build_bpe(args.bpe, getattr(args, "bpe_codes", None), args=args)
    tokenizer = build_tokenizer(args.tokenizer, args=args)

    def encode_fn(text):
        if tokenizer is not None:
            text = tokenizer.encode(text)
        if bpe is not None:
            text = bpe.encode(text)
        return text

    def decode_fn(text):
        if bpe is not None:
            text = bpe.decode(text)
        if tokenizer is not None:
            text = tokenizer.decode(text)
        return text
    model = build_model(args, len(sd), len(td))
    dummy = jnp.zeros((1, 16), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), dummy, dummy))()
    params = load_params(args, model, params)
    K = args.beam

    def decode_batch(lines):
        """Decode a buffer of raw lines as ONE batched beam search
        (fairseq --buffer-size batching, ``interactive.py`` make_batches)."""
        B = len(lines)
        texts, all_phrases = [], []
        for line in lines:
            phrases = []
            if getattr(args, "constraints", False):
                # fairseq_cli/interactive.py:59-79 — constraint phrases
                # arrive tab-separated after the sentence
                line, *phrases = line.rstrip("\n").split("\t")
            texts.append(line)
            all_phrases.append(phrases)
        constraints = None
        if any(all_phrases):
            rows = [[td.encode_line(p, append_eos=False) for p in ph]
                    for ph in all_phrases]
            n = max(1, max(len(r) for r in rows))
            cl = max([1] + [len(t) for r in rows for t in r])
            arr = np.full((B, n, cl), td.pad(), np.int32)
            for b, r in enumerate(rows):
                for i, t in enumerate(r):
                    arr[b, i, : len(t)] = t
            constraints = jnp.asarray(arr)
        src = collate_tokens([sd.encode_line(encode_fn(t)) for t in texts],
                             pad_idx=sd.pad())
        enc_out, enc_pad = model.apply(params, jnp.asarray(src),
                                       method=TransformerModel.encode)
        enc_out_k = jnp.repeat(enc_out, K, axis=0)
        enc_pad_k = jnp.repeat(enc_pad, K, axis=0)

        def step_fn(cache, tokens, step):
            logits, cache = model.apply(
                params, cache, tokens, step, enc_out_k, enc_pad_k,
                method=TransformerModel.decode_step)
            return logits[:, 0], cache

        gen = SequenceGenerator(
            step_fn,
            lambda b, l: model.apply(params, b, l,
                                     method=TransformerModel.init_decode_state),
            vocab_size=len(td), beam_size=K, max_len=args.max_len_b,
            len_penalty=args.lenpen, pad=td.pad(), eos=td.eos())
        tokens, scores = gen.generate(batch=B, constraints=constraints)
        for b in range(B):
            hyp = np.asarray(tokens[b, 0, 1:])
            eos_pos = np.where(hyp == td.eos())[0]
            if len(eos_pos):
                hyp = hyp[: eos_pos[0]]
            print(f"H-{float(scores[b, 0]):.4f}"
                  f"\t{decode_fn(td.string(hyp))}")
        sys.stdout.flush()

    # --input FILE or stdin; --buffer-size batches the stream
    stream = (sys.stdin if getattr(args, "input", "-") in ("-", None)
              else open(args.input, encoding="utf-8"))
    if stream is sys.stdin:
        print("| Type the input sentence and press return:", file=sys.stderr)
    bufsz = max(1, getattr(args, "buffer_size", 0))
    buf = []
    for line in stream:
        if not line.strip():
            continue
        buf.append(line)
        if len(buf) >= bufsz:
            decode_batch(buf)
            buf = []
    if buf:
        decode_batch(buf)
    if stream is not sys.stdin:
        stream.close()


if __name__ == "__main__":
    cli_main()
