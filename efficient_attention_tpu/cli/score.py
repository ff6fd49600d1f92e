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

    if args.metric != "bleu":
        from efficient_attention_tpu.scoring import build_scorer

        scorer = build_scorer(args.metric)
        with open(args.sys, encoding="utf-8") as fs, \
                open(args.ref, encoding="utf-8") as fr:
            for hyp, ref in zip(fs, fr):
                scorer.add_string(ref.rstrip("\n"), hyp.rstrip("\n"))
        print(scorer.result_string())
        return scorer.score()

    from efficient_attention_tpu.scoring.bleu import BleuScorer

    # word-level scoring over whitespace tokens mapped to ids
    vocab = {}

    def ids(line):
        out = []
        for w in line.split():
            if w not in vocab:
                vocab[w] = len(vocab) + 10
            out.append(vocab[w])
        return out

    scorer = BleuScorer()
    with open(args.sys, encoding="utf-8") as fs, \
            open(args.ref, encoding="utf-8") as fr:
        for hyp, ref in zip(fs, fr):
            scorer.add(ids(ref), ids(hyp))
    print(scorer.result_string(args.order))
    return scorer.score(args.order)


if __name__ == "__main__":
    cli_main()
