"""Corpus binarization CLI — ``fairseq_cli/preprocess.py`` equivalent.

Builds a :class:`Dictionary` from the training corpus and writes mmap
binarized ``.bin/.idx`` shards for each split, monolingual (LM) or paired
(MT with ``--source-lang/--target-lang``).  ``--srcdict/--tgtdict`` reuse
existing dictionaries (the published-checkpoint workflow: binarize new
data against the released vocab), ``--dict-only`` stops after writing the
dictionaries.
"""
from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser("eatpu-preprocess")
    p.add_argument("--trainpref", required=True)
    p.add_argument("--validpref", default=None)
    p.add_argument("--testpref", default=None)
    p.add_argument("--destdir", required=True)
    p.add_argument("--source-lang", "-s", default=None)
    p.add_argument("--target-lang", "-t", default=None)
    p.add_argument("--thresholdsrc", type=int, default=-1,
                   help="map source words appearing fewer times to <unk>")
    p.add_argument("--thresholdtgt", type=int, default=-1)
    p.add_argument("--nwordssrc", type=int, default=-1,
                   help="retain only the top-N source words")
    p.add_argument("--nwordstgt", type=int, default=-1)
    p.add_argument("--srcdict", default=None,
                   help="reuse this dictionary file instead of building "
                        "one (fairseq --srcdict)")
    p.add_argument("--tgtdict", default=None)
    p.add_argument("--joined-dictionary", action="store_true")
    p.add_argument("--only-source", action="store_true")
    p.add_argument("--dict-only", action="store_true",
                   help="write the dictionaries and stop (fairseq "
                        "--dict-only)")
    return p


def _binarize(text_path, dictionary, out_prefix):
    from efficient_attention_tpu.data.indexed_dataset import binarize_file

    stats = binarize_file(text_path, dictionary, out_prefix)
    print(f"| {text_path}: {stats['sequences']} sents, {stats['tokens']} "
          f"tokens, {100 * stats['unk'] / max(stats['tokens'], 1):.2f}% <unk>")


def main(args):
    from efficient_attention_tpu.data.dictionary import Dictionary

    os.makedirs(args.destdir, exist_ok=True)
    langs = [l for l in (args.source_lang, args.target_lang) if l]
    if not langs:
        langs = [None]
    if args.only_source and args.target_lang:
        langs = [args.source_lang]

    def path(pref, lang):
        return f"{pref}.{lang}" if lang else pref

    def corpus_lines():
        for lang in langs:
            with open(path(args.trainpref, lang), encoding="utf-8") as f:
                yield from f

    def per_lang(lang):
        """(existing-dict path, threshold, nwords) for this side — the
        two sides are independent, as in fairseq (no cross-side
        fallback)."""
        if lang is not None and lang == args.target_lang:
            return args.tgtdict, args.thresholdtgt, args.nwordstgt
        return args.srcdict, args.thresholdsrc, args.nwordssrc

    if args.joined_dictionary or len(langs) == 1:
        if args.srcdict:
            d = Dictionary.load(args.srcdict)
        else:
            d = Dictionary.build_from_corpus(
                corpus_lines(), threshold=args.thresholdsrc,
                nwords=args.nwordssrc)
        dicts = {lang: d for lang in langs}
    else:
        dicts = {}
        for lang in langs:
            existing, threshold, nwords = per_lang(lang)
            if existing:
                dicts[lang] = Dictionary.load(existing)
            else:
                with open(path(args.trainpref, lang),
                          encoding="utf-8") as f:
                    dicts[lang] = Dictionary.build_from_corpus(
                        f, threshold=threshold, nwords=nwords)

    for lang in langs:
        suffix = f".{lang}" if lang else ""
        dicts[lang].save(os.path.join(args.destdir, f"dict{suffix}.txt"))
    if args.dict_only:
        print(f"| Wrote dictionaries to {args.destdir} (--dict-only)")
        return
    for lang in langs:
        suffix = f".{lang}" if lang else ""
        for split, pref in (("train", args.trainpref),
                            ("valid", args.validpref),
                            ("test", args.testpref)):
            if pref:
                _binarize(path(pref, lang), dicts[lang],
                          os.path.join(args.destdir, f"{split}{suffix}"))
    print(f"| Wrote preprocessed data to {args.destdir}")


def cli_main(argv=None):
    main(build_parser().parse_args(argv))


if __name__ == "__main__":
    cli_main()
