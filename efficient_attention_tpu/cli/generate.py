"""Beam-search generation + BLEU — ``fairseq_cli/generate.py`` equivalent.

Loads (and optionally averages, ``scripts/average_checkpoints.py`` +
``main.sh:160-164``) MT checkpoints, runs batched beam search (beam 4,
lenpen 0.6 per the WMT recipe) and reports corpus BLEU.
"""
from __future__ import annotations

import json
import os

import numpy as np

from efficient_attention_tpu.cli.train_mt import build_model, build_parser, load_pairs


def parse_args(argv=None):
    from efficient_attention_tpu import AttentionFactory, NestedNamespace

    parser = build_parser()
    parser.add_argument("--path", default=None, help="checkpoint dir")
    parser.add_argument("--beam", type=int, default=4)
    parser.add_argument("--lenpen", type=float, default=0.6)
    parser.add_argument("--max-len-b", type=int, default=64)
    parser.add_argument("--max-len-a", type=float, default=0.0,
                        help="per-sentence max output length = "
                             "max-len-a*src_len + max-len-b "
                             "(fairseq generation config)")
    parser.add_argument("--min-len", type=int, default=1,
                        help="minimum output length (eos banned below)")
    parser.add_argument("--match-source-len", action="store_true",
                        help="force each output to its source's length "
                             "(LengthConstrainedBeamSearch with "
                             "min=max=src_len)")
    parser.add_argument("--input", default="-",
                        help="(interactive) file to read from; '-' = stdin "
                             "(fairseq InteractiveConfig.input)")
    parser.add_argument("--buffer-size", type=int, default=0,
                        help="(interactive) read this many sentences into "
                             "a buffer and decode them as one batch "
                             "(fairseq InteractiveConfig.buffer_size)")
    parser.add_argument("--print-alignment", nargs="?", const="hard",
                        default=None, choices=["hard", "soft"],
                        help="emit A- source-target alignment lines from "
                             "the last decoder layer's cross-attention "
                             "(fairseq --print-alignment; computed by "
                             "teacher-forcing the chosen hypothesis)")
    parser.add_argument("--lm-path", default=None,
                        help="checkpoint dir of a TransformerLM for "
                             "shallow fusion during decoding (fairseq "
                             "--lm-path); the LM must share the target "
                             "vocabulary")
    parser.add_argument("--lm-config", default=None,
                        help="YAML config describing the fusion LM "
                             "architecture (train_lm --config surface); "
                             "omit for the train_lm defaults")
    parser.add_argument("--lm-weight", type=float, default=0.0,
                        help="fusion weight: log p_MT + w * log p_LM "
                             "(fairseq --lm-weight); the fused "
                             "distribution is renormalized per step")
    parser.add_argument("--scoring", default="bleu",
                        choices=["bleu", "chrf", "wer"],
                        help="hypothesis scorer (fairseq --scoring / "
                             "--sacrebleu analogue; the chrF/WER scorers "
                             "are native ports of the sacrebleu "
                             "statistics)")
    parser.add_argument("--nbest", type=int, default=1,
                        help="emit the top-N beam hypotheses per sentence "
                             "(fairseq --nbest); BLEU uses the best")
    parser.add_argument("--unnormalized", action="store_true",
                        help="do not length-normalize hypothesis scores "
                             "(fairseq --unnormalized)")
    parser.add_argument("--unkpen", type=float, default=0.0,
                        help="per-step penalty subtracted from the <unk> "
                             "log-prob (fairseq --unkpen)")
    parser.add_argument("--no-repeat-ngram-size", type=int, default=0,
                        help="ban repeating n-grams of this size during "
                             "beam search (fairseq --no-repeat-ngram-size; "
                             "the ngram_repeat_block port)")
    parser.add_argument("--score-reference", action="store_true",
                        help="score the reference translations with the "
                             "model instead of generating (fairseq "
                             "--score-reference, sequence_scorer.py); "
                             "emits P- per-token score lines")
    parser.add_argument("--sampling", action="store_true",
                        help="sample instead of beam search "
                             "(fairseq --sampling; beam size 1)")
    parser.add_argument("--sampling-topk", type=int, default=-1)
    parser.add_argument("--sampling-topp", type=float, default=-1.0)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--gen-batch", type=int, default=8)
    parser.add_argument("--num-avg-checkpoints", type=int, default=1)
    parser.add_argument("--gen-subset-size", type=int, default=32)
    # search strategies (fairseq generate flags)
    parser.add_argument("--diverse-beam-groups", type=int, default=-1)
    parser.add_argument("--diverse-beam-strength", type=float, default=0.5)
    parser.add_argument("--diversity-rate", type=float, default=-1.0,
                        help="diverse-siblings gamma (>0 enables)")
    parser.add_argument("--prefix-size", type=int, default=0,
                        help="force hypotheses to start with the first N "
                             "reference tokens")
    parser.add_argument("--constraints", action="store_true",
                        help="lexically-constrained decoding: interactive "
                             "input lines carry tab-separated constraint "
                             "phrases after the sentence "
                             "(fairseq --constraints)")
    parser.add_argument("--bpe", default=None,
                        help="raw-text BPE scheme for interactive input "
                             "(subword_nmt/bytes/characters/gpt2/"
                             "sentencepiece; fairseq/data/encoders/)")
    parser.add_argument("--bpe-codes", default=None,
                        help="subword-nmt codes file")
    parser.add_argument("--gpt2-encoder-json", default=None,
                        help="local encoder.json for --bpe gpt2")
    parser.add_argument("--gpt2-vocab-bpe", default=None,
                        help="local vocab.bpe for --bpe gpt2")
    parser.add_argument("--sentencepiece-model", default=None,
                        help="model file for --bpe sentencepiece")
    parser.add_argument("--tokenizer", default=None,
                        help="raw-text pre-tokenizer (space/moses/nltk)")
    parser.add_argument("--moses-no-dash-splits", action="store_true",
                        default=False)
    parser.add_argument("--moses-no-escape", action="store_true",
                        default=True)
    parser.add_argument("--results-path", default=None,
                        help="write fairseq-style S-/T-/H- generation output "
                             "(gen.out) here, consumable by "
                             "scripts/compound_split_bleu.sh "
                             "(fairseq_cli/generate.py --results-path)")
    parser.add_argument("--remove-bpe", nargs="?", const="@@ ", default=None,
                        help="strip BPE continuation markers from hyp/ref "
                             "before scoring (fairseq --remove-bpe)")
    known, _ = parser.parse_known_args(argv)
    parser = AttentionFactory.add_attn_specific_args(
        parser, known.attn_name_encoder, struct_name="attn_args_encoder",
        prefix="encoder-attn")
    parser = AttentionFactory.add_attn_specific_args(
        parser, known.attn_name_decoder, struct_name="attn_args_decoder",
        prefix="decoder-attn")
    parser.add_argument("--help", action="help")
    return parser.parse_args(argv, namespace=NestedNamespace())


def load_params(args, model, template_params):
    """Load the latest checkpoint; with --num-avg-checkpoints N > 1, average
    the last N (``scripts/average_checkpoints.py``)."""
    import jax

    from efficient_attention_tpu.training import (
        CheckpointManager,
        average_checkpoints,
    )

    if not args.path:
        return template_params
    mgr = CheckpointManager(os.path.abspath(args.path))
    steps = sorted(mgr.manager.all_steps())
    if not steps:
        return template_params
    take = steps[-args.num_avg_checkpoints:]
    param_sets = []
    for s in take:
        # params-only restore: inference doesn't know the training
        # optimizer's state structure
        _, p = mgr.restore_params(step=s)
        param_sets.append(jax.device_get(p))
    print(f"| averaged {len(param_sets)} checkpoints: {take}")
    params = (param_sets[0] if len(param_sets) == 1
              else average_checkpoints(param_sets))
    # LayerDrop inference-time pruning (fairseq prune_state_dict,
    # checkpoint_utils.py:674): full-depth checkpoint -> shallower model
    from efficient_attention_tpu.training.checkpoint import (
        parse_layers_to_keep,
        prune_layer_params,
    )

    for flag, scope in (("encoder_layers_to_keep", "encoder"),
                        ("decoder_layers_to_keep", "decoder")):
        keep = parse_layers_to_keep(getattr(args, flag, None))
        if keep:
            params = prune_layer_params(params, keep, scope)
            print(f"| pruned {scope} to layers {keep}")
    return params


def main(args) -> dict:
    import jax
    import jax.numpy as jnp

    from efficient_attention_tpu.data.text_data import collate_tokens
    from efficient_attention_tpu.generation import SequenceGenerator
    from efficient_attention_tpu.generation.beam_search import sample_decode
    from efficient_attention_tpu.models.transformer import TransformerModel
    from efficient_attention_tpu.scoring.bleu import BleuScorer, WordIdMapper

    src, tgt, sd, td = load_pairs(args)
    src_vocab = len(sd) if sd else args.dummy_vocab
    tgt_vocab = len(td) if td else args.dummy_vocab
    model = build_model(args, src_vocab, tgt_vocab)
    dummy = jnp.zeros((1, 16), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), dummy, dummy))()
    params = load_params(args, model, params)

    # ---- LM shallow fusion (fairseq --lm-path/--lm-weight: the generator
    # adds a weighted LM score to every decoder step) ----
    lm_model = lm_params = None
    if args.lm_path and args.lm_weight != 0.0:
        from efficient_attention_tpu.cli import train_lm as _lm_cli
        from efficient_attention_tpu.training import CheckpointManager

        lm_argv = (["--config", args.lm_config] if args.lm_config else [])
        lm_args = _lm_cli.parse_args(lm_argv)
        lm_model = _lm_cli.build_model(lm_args, tgt_vocab)
        # params come straight from the checkpoint; no device init needed
        restored = CheckpointManager(
            os.path.abspath(args.lm_path)).restore_params()
        if restored is None:
            raise FileNotFoundError(
                f"--lm-path {args.lm_path}: no checkpoint found")
        _, lm_params = restored
        print(f"| fusion LM loaded from {args.lm_path} "
              f"(weight {args.lm_weight})")

    def post_process(sentence: str) -> str:
        """fairseq ``--remove-bpe``: drop BPE continuation markers
        (``fairseq/data/data_utils.py`` ``post_process`` for the
        subword-nmt symbol)."""
        if args.remove_bpe is None:
            return sentence
        return (sentence + " ").replace(args.remove_bpe, "").rstrip()

    if args.scoring == "bleu":
        scorer = BleuScorer()
    else:
        from efficient_attention_tpu.scoring import build_scorer

        scorer = build_scorer(args.scoring)
    word_ids = WordIdMapper()

    def add_to_scorer(ref, hyp, ref_str, hyp_str):
        if args.scoring != "bleu":
            # string scorers (chrF/WER) consume post-processed text; fall
            # back to space-joined ids when no dictionary is loaded
            scorer.add_string(ref_str if td is not None
                              else " ".join(map(str, ref.tolist())),
                              hyp_str if td is not None
                              else " ".join(map(str, hyp.tolist())))
        elif td is not None and args.remove_bpe is not None:
            # score the post-processed word sequences, as fairseq does
            # when --remove-bpe is given (fairseq_cli/generate.py)
            scorer.add(word_ids(ref_str), word_ids(hyp_str))
        else:
            scorer.add(ref.tolist(), hyp.tolist())

    K = 1 if args.sampling else args.beam
    n_out = 0
    outputs = []
    gen_lines = []
    ids = list(range(min(len(src), args.gen_subset_size)))

    # ---- jitted generation plumbing (shared across batches) ----
    # Model params and the per-batch encoder outputs ride the generator's
    # ``ctx`` pytree — traced jit arguments, so repeat batches with the
    # same (bucketed) shapes reuse ONE compiled beam-loop executable
    # instead of re-tracing the decoder body per batch.  The cross-attn
    # K/V is projected once per sentence at init (fairseq static_kv,
    # ``transformer_layer.py:435-450``).
    def step_fn(ctx, cache, tokens, step):
        p, _, pad_k, lmp = ctx
        if lm_model is not None:
            states, lm_states = cache
        else:
            states = cache
        logits, states = model.apply(
            p, states, tokens, step, None, pad_k,
            method=TransformerModel.decode_step)
        out = logits[:, 0]
        if lm_model is not None:
            # shallow fusion: log p_MT + w * log p_LM (the beam
            # renormalizes the fused row)
            lm_logits, lm_states = lm_model.apply(
                lmp, lm_states, tokens, step,
                method=lm_model.decode_step)
            out = (jax.nn.log_softmax(out, axis=-1)
                   + args.lm_weight
                   * jax.nn.log_softmax(lm_logits[:, 0], axis=-1))
            return out, (states, lm_states)
        # --unkpen is applied INSIDE the generator after its
        # normalization (fairseq lprobs semantics)
        return out, states

    def init_cache(ctx, bk, max_len):
        p, out_k, _, lmp = ctx
        states = model.apply(p, bk, max_len, jnp.float32, out_k,
                             method=TransformerModel.init_decode_state)
        if lm_model is not None:
            return states, lm_model.apply(
                lmp, bk, max_len, method=lm_model.init_decode_state)
        return states

    generators = {}  # (buf_len, frozen len_kw) -> SequenceGenerator

    for i in range(0, len(ids), args.gen_batch):
        chunk = ids[i: i + args.gen_batch]
        # bucket the source pad length to a multiple of 16 so encoder /
        # beam-loop executables recur across batches (padding only adds
        # masked keys; results are unchanged)
        src_pad_to = max(len(src[j]) for j in chunk)
        src_pad_to += (-src_pad_to) % 16
        src_b = collate_tokens([src[j] for j in chunk], pad_idx=1,
                               pad_to_length=src_pad_to)
        B = src_b.shape[0]
        enc_out, enc_pad = model.apply(params, jnp.asarray(src_b),
                                       method=TransformerModel.encode)
        # expand encoder outputs over beams
        enc_out_k = jnp.repeat(enc_out, K, axis=0)
        enc_pad_k = jnp.repeat(enc_pad, K, axis=0)
        ctx = (params, enc_out_k, enc_pad_k, lm_params)

        src_lens = (np.asarray(src_b) != 1).sum(axis=1)
        if args.match_source_len:
            # fairseq generate.py: LengthConstrained with min=max=src_len
            buf_len = int(src_lens.max()) + 1
            len_kw = dict(min_len=0, min_len_a=1.0,
                          max_len_a=1.0, max_len_b=0)
        else:
            buf_len = int(args.max_len_a * src_b.shape[1]) + args.max_len_b
            len_kw = dict(min_len=args.min_len, max_len_a=args.max_len_a,
                          max_len_b=(args.max_len_b if args.max_len_a > 0
                                     else None))
        buf_len += (-buf_len) % 16  # bucket: executables recur
        pscores = None
        if args.score_reference:
            # teacher-forcing scoring of the references (fairseq
            # --score-reference -> SequenceScorer.generate): one parallel
            # forward, per-token log-probs of the gold target
            tgt_b = collate_tokens([tgt[j] for j in chunk], pad_idx=1)
            prev_b = collate_tokens([tgt[j] for j in chunk], pad_idx=1,
                                    move_eos_to_beginning=True)
            logits = model.apply(params, jnp.asarray(src_b),
                                 jnp.asarray(prev_b))
            lp = np.asarray(jax.nn.log_softmax(logits, axis=-1),
                            np.float32)
            tok_lp = np.take_along_axis(
                lp, np.asarray(tgt_b)[..., None], axis=-1)[..., 0]
            mask = np.asarray(tgt_b) != 1
            tok_lp = np.where(mask, tok_lp, 0.0)
            # hypothesis IS the reference; score = avg token log-prob
            tokens = jnp.asarray(np.concatenate(
                [np.full((B, 1), 2, np.int64), tgt_b], axis=1))[:, None, :]
            scores = jnp.asarray(
                tok_lp.sum(axis=1) / np.maximum(mask.sum(axis=1), 1)
            )[:, None]
            pscores = tok_lp
        elif args.sampling:
            toks_flat, samp_scores = sample_decode(
                step_fn, init_cache, B, buf_len, bos=2, eos=2,
                rng=jax.random.fold_in(
                    jax.random.PRNGKey(args.seed), i),
                temperature=args.temperature,
                top_k=max(args.sampling_topk, 0),
                top_p=max(args.sampling_topp, 0.0), return_scores=True,
                ctx=ctx)
            tokens = jnp.concatenate(
                [jnp.full((B, 1), 2, jnp.int32), toks_flat],
                axis=1)[:, None, :]
            scores = samp_scores[:, None]
        else:
            gen_key = (buf_len, tuple(sorted(
                (k, v) for k, v in len_kw.items() if v is not None)))
            if gen_key not in generators:
                generators[gen_key] = SequenceGenerator(
                    step_fn, init_cache, vocab_size=tgt_vocab, beam_size=K,
                    max_len=buf_len,
                    len_penalty=0.0 if args.unnormalized else args.lenpen,
                    no_repeat_ngram_size=args.no_repeat_ngram_size,
                    unk_penalty=args.unkpen,
                    diversity_groups=max(args.diverse_beam_groups, 1),
                    diversity_strength=args.diverse_beam_strength,
                    diverse_siblings_gamma=max(args.diversity_rate, 0.0),
                    **len_kw)
            gen = generators[gen_key]
            prefix = None
            if args.prefix_size > 0:
                prefix = collate_tokens(
                    [tgt[j][: args.prefix_size] for j in chunk], pad_idx=1,
                    pad_to_length=args.prefix_size)
            tokens, scores = gen.generate(
                batch=B, prefix_tokens=prefix,
                src_lengths=jnp.asarray(src_lens), ctx=ctx)
        align = None
        if args.print_alignment:
            # teacher-force the 1-best hypotheses through the model and
            # read the last layer's head-averaged cross-attention
            hyps_b = []
            for b in range(B):
                hb = np.asarray(tokens[b, 0, 1:])
                e = np.where(hb == 2)[0]
                hyps_b.append(hb[: e[0] + 1] if len(e) else hb)
            hyp_pad = collate_tokens(hyps_b, pad_idx=1)
            prev_pad = collate_tokens(hyps_b, pad_idx=1,
                                      move_eos_to_beginning=True)
            _, align = model.apply(
                params, jnp.asarray(src_b), jnp.asarray(prev_pad),
                method=TransformerModel.forward_with_alignment)
            align = np.asarray(align)  # [B, T, S]
        for b, j in enumerate(chunk):
            hyp = np.asarray(tokens[b, 0, 1:])
            # trim at eos
            eos_pos = np.where(hyp == 2)[0]
            if len(eos_pos):
                hyp = hyp[: eos_pos[0] + 1]
            ref = np.asarray(tgt[j])
            hyp_str = post_process(td.string(hyp)) if td is not None else ""
            ref_str = post_process(td.string(ref)) if td is not None else ""
            add_to_scorer(ref, hyp, ref_str, hyp_str)
            n_out += 1
            if td is not None:
                hyp_str = post_process(td.string(hyp))
                ref_str = post_process(td.string(ref))
                outputs.append({
                    "id": int(j),
                    "hyp": hyp_str,
                    "ref": ref_str,
                    "score": float(scores[b, 0]),
                })
                # fairseq gen.out line format (fairseq_cli/generate.py):
                # S-id<TAB>src / T-id<TAB>ref / H-id<TAB>score<TAB>hyp
                src_str = post_process(
                    sd.string(np.asarray(src[j]))) if sd else ""
                gen_lines.append(f"S-{j}\t{src_str}")
                gen_lines.append(f"T-{j}\t{ref_str}")
                gen_lines.append(f"H-{j}\t{scores[b, 0]:.4f}\t{hyp_str}")
                # --nbest: runner-up hypotheses after the 1-best
                for k in range(1, min(args.nbest, tokens.shape[1])):
                    hk = np.asarray(tokens[b, k, 1:])
                    ek = np.where(hk == 2)[0]
                    if len(ek):
                        hk = hk[: ek[0] + 1]
                    gen_lines.append(
                        f"H-{j}\t{scores[b, k]:.4f}\t"
                        + post_process(td.string(hk)))
                if pscores is not None:
                    n_tok = int((np.asarray(tgt[j]) != 1).sum())
                    gen_lines.append("P-{}\t{}".format(
                        j, " ".join(f"{v:.4f}"
                                    for v in pscores[b, :n_tok])))
                if align is not None:
                    n_src = int(src_lens[b])
                    rows = align[b, : len(hyp), : n_src]
                    if args.print_alignment == "hard":
                        pairs = [f"{int(rows[t].argmax())}-{t}"
                                 for t in range(rows.shape[0])]
                        gen_lines.append(f"A-{j}\t" + " ".join(pairs))
                    else:  # soft: per-step comma-joined source probs
                        gen_lines.append(f"A-{j}\t" + " ".join(
                            ",".join(f"{v:.4f}" for v in rows[t])
                            for t in range(rows.shape[0])))
    result = {"bleu" if args.scoring == "bleu" else args.scoring:
              scorer.score(), "sentences": n_out,
              "detail": scorer.result_string()}
    print("| " + scorer.result_string())
    if args.results_path:
        # final line mirrors fairseq's "Generate test with beam=N: BLEU..."
        # sentinel that compound_split_bleu.sh greps for completion
        gen_lines.append(
            f"Generate test with beam={K}: {scorer.result_string()}")
        with open(args.results_path, "w", encoding="utf-8") as f:
            f.write("\n".join(gen_lines) + "\n")
        print(f"| wrote generation output to {args.results_path}")
    print(json.dumps({k: v for k, v in result.items() if k != "detail"}))
    return result


def cli_main(argv=None):
    return main(parse_args(argv))


if __name__ == "__main__":
    cli_main()
