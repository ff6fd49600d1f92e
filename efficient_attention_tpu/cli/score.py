"""Standalone BLEU scoring of hypothesis/reference files
(``fairseq_cli/score.py`` equivalent)."""
from __future__ import annotations

import argparse


def cli_main(argv=None):
    p = argparse.ArgumentParser("eatpu-score")
    p.add_argument("--sys", "-s", required=True, help="system output file")
    p.add_argument("--ref", "-r", required=True, help="reference file")
    p.add_argument("--order", type=int, default=4)
    p.add_argument("--metric", default="bleu",
                   choices=["bleu", "chrf", "wer"],
                   help="scorer (fairseq/scoring/ registry)")
    args = p.parse_args(argv)

    with open(args.sys, encoding="utf-8") as f:
        hyps = [ln.rstrip("\n") for ln in f]
    with open(args.ref, encoding="utf-8") as f:
        refs = [ln.rstrip("\n") for ln in f]
    if len(hyps) != len(refs):
        # a truncated generation run must not produce a plausible-looking
        # prefix score (fairseq score.py asserts the same)
        raise SystemExit(
            f"line count mismatch: {args.sys} has {len(hyps)} lines, "
            f"{args.ref} has {len(refs)}")

    if args.metric != "bleu":
        from efficient_attention_tpu.scoring import build_scorer

        scorer = build_scorer(args.metric)
        for hyp, ref in zip(hyps, refs):
            scorer.add_string(ref, hyp)
        print(scorer.result_string())
        return scorer.score()

    from efficient_attention_tpu.scoring.bleu import BleuScorer, WordIdMapper

    # word-level scoring over whitespace tokens mapped to ids
    ids = WordIdMapper()

    scorer = BleuScorer()
    for hyp, ref in zip(hyps, refs):
        scorer.add(ids(ref), ids(hyp))
    print(scorer.result_string(args.order))
    return scorer.score(args.order)


if __name__ == "__main__":
    cli_main()
