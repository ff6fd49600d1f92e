#!/bin/bash
# Compound-split tokenized BLEU over a fairseq-style gen.out.
#
# Port of the reference WMT eval step (reference
# fairseq/scripts/compound_split_bleu.sh, invoked by main.sh:176): extract
# hypothesis/reference lines, split hyphen compounds into
# "a ##AT##-##AT## b" tokens, and score word-level BLEU.

if [ $# -ne 1 ]; then
    echo "usage: $0 GENERATE_OUTPUT"
    exit 1
fi

GEN=$1

SYS=$GEN.sys
REF=$GEN.ref

if [ "$(tail -n 1 "$GEN" | grep BLEU | wc -l)" -ne 1 ]; then
    echo "not done generating"
    exit
fi

grep ^H "$GEN" | awk -F '\t' '{print $NF}' | perl -ple 's{(\S)-(\S)}{$1 ##AT##-##AT## $2}g' > "$SYS"
grep ^T "$GEN" | cut -f2- | perl -ple 's{(\S)-(\S)}{$1 ##AT##-##AT## $2}g' > "$REF"
python3 -m efficient_attention_tpu.cli.score --sys "$SYS" --ref "$REF"
