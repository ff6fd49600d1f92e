#!/usr/bin/env bash
# Single launcher for the three benchmark workloads — the TPU-native
# equivalent of the reference's main.sh (197-line getopts dispatcher).
# Usage: bash main.sh -d {imagenet,wikitext103,wmt} -m <model> [-a <attn>]
#                     [-p <datapath>] [-i] [-e "<extra flags>"]
set -euo pipefail

MODEL="evit_tiny_p16"
ATTN="eva"
DATASET=""
DATAPATH=""
INFERENCE_ONLY=0
EXTRA=""
SUFFIX="run"

while getopts "m:a:d:p:s:ie:" opt; do
  case $opt in
    m) MODEL="$OPTARG" ;;
    a) ATTN="$OPTARG" ;;
    d) DATASET="$OPTARG" ;;
    p) DATAPATH="$OPTARG" ;;
    s) SUFFIX="$OPTARG" ;;
    i) INFERENCE_ONLY=1 ;;
    e) EXTRA="$OPTARG" ;;
    *) echo "usage: main.sh -d {imagenet,wikitext103,wmt} [-m model] [-a attn] [-p datapath] [-i] [-e extra]"; exit 1 ;;
  esac
done

case "$DATASET" in
  imagenet)
    # DeiT recipe (reference README.md:104-145): 300 epochs, batch 128/chip,
    # lr 5e-4*batch*chips/512, cosine, warmup 10, EVA: 49 landmarks window 7 2-D RPE
    ATTN_FLAGS=""
    if [ "$ATTN" = "eva" ]; then
      ATTN_FLAGS="--attn-window-size 7 --attn-num-landmarks 49 --attn-attn-2d --attn-use-rpe"
    elif [ "$ATTN" = "lara" ]; then
      ATTN_FLAGS="--attn-num-landmarks 49 --attn-proposal-gen pool-mixed --attn-mis-type mis-opt --attn-alpha-coeff 2.0"
    fi
    DATA_FLAGS="--data-set SYNTHETIC"
    [ -n "$DATAPATH" ] && DATA_FLAGS="--data-set IMAGENET --data-path $DATAPATH"
    MODE_FLAGS=""
    [ "$INFERENCE_ONLY" = 1 ] && MODE_FLAGS="--eval"
    python -m efficient_attention_tpu.cli.train_vit \
      --model "$MODEL" --attn-name "$ATTN" $ATTN_FLAGS \
      --batch-size 128 --epochs 300 --lr 5e-4 --warmup-epochs 10 \
      --clip-grad 5.0 --repeated-aug --model-ema \
      --output-dir "checkpoints/imagenet_${MODEL}_${ATTN}_${SUFFIX}" \
      $DATA_FLAGS $MODE_FLAGS $EXTRA
    ;;

  wikitext103)
    # LM recipe (main.sh:52-125): causal-EVA window 128 chunk 8, nag lr 1.0
    # cosine t-mult 2, 286k updates, tokens-per-sample 512, adaptive loss
    DATA_FLAGS="--dummy-data"
    [ -n "$DATAPATH" ] && DATA_FLAGS="--data $DATAPATH"
    SAVE="checkpoints/wt103_${ATTN}_${SUFFIX}"
    if [ "$INFERENCE_ONLY" = 0 ]; then
      python -m efficient_attention_tpu.cli.train_lm $DATA_FLAGS \
        --attn-name-decoder causal_eva \
        --decoder-attn-window-size 128 --decoder-attn-chunk-size 8 \
        --decoder-attn-adaptive-proj qk --decoder-attn-use-t5-rpe \
        --decoder-attn-causal \
        --decoder-layers 16 --decoder-embed-dim 1024 \
        --decoder-ffn-embed-dim 4096 \
        --adaptive-input --tie-adaptive-weights --no-decoder-final-norm \
        --optimizer nag --lr 1.0 --lr-scheduler cosine --t-mult 2 \
        --lr-period-updates 270000 --max-update 286000 \
        --tokens-per-sample 512 --max-tokens 9216 \
        --criterion adaptive_loss --clip-norm 0.1 \
        --save-dir "$SAVE" $EXTRA
    fi
    # eval at context windows 0/256/480 (main.sh:84-124)
    for CTX in 0 256 480; do
      python -m efficient_attention_tpu.cli.eval_lm $DATA_FLAGS \
        --attn-name-decoder causal_eva \
        --decoder-attn-window-size 128 --decoder-attn-chunk-size 8 \
        --decoder-attn-adaptive-proj qk --decoder-attn-use-t5-rpe \
        --decoder-attn-causal \
        --decoder-layers 16 --decoder-embed-dim 1024 \
        --decoder-ffn-embed-dim 4096 --criterion adaptive_loss \
        --adaptive-input --tie-adaptive-weights --no-decoder-final-norm \
        --optimizer nag --checkpoint "$SAVE/ckpt" \
        --tokens-per-sample 512 --context-window "$CTX" $EXTRA
    done
    ;;

  wmt)
    # MT recipe (main.sh:127-177): adam lr 7e-4 inverse-sqrt warmup 6k,
    # 300k updates, avg last 10 ckpts, beam 4 lenpen 0.6
    DATA_FLAGS="--dummy-data"
    [ -n "$DATAPATH" ] && DATA_FLAGS="--data $DATAPATH"
    SAVE="checkpoints/wmt_${ATTN}_${SUFFIX}"
    ENC_FLAGS=""
    if [ "$ATTN" = "eva" ]; then
      ENC_FLAGS="--attn-name-encoder eva --encoder-attn-window-size 8 \
        --encoder-attn-num-landmarks 8 --encoder-attn-overlap-window \
        --encoder-attn-use-t5-rpe --encoder-attn-adaptive-proj no-ln"
    elif [ "$ATTN" = "lara" ]; then
      ENC_FLAGS="--attn-name-encoder lara --encoder-attn-num-landmarks 16 \
        --encoder-attn-proposal-gen adaptive-1d --encoder-attn-mis-type mis-opt"
    fi
    if [ "$INFERENCE_ONLY" = 0 ]; then
      python -m efficient_attention_tpu.cli.train_mt $DATA_FLAGS \
        $ENC_FLAGS --attn-name-decoder causal_eva \
        --decoder-attn-window-size 16 --decoder-attn-chunk-size 8 \
        --decoder-attn-adaptive-proj qk --decoder-attn-causal \
        --share-all-embeddings \
        --optimizer adam --adam-betas "(0.9, 0.98)" --lr 7e-4 \
        --warmup-updates 6000 --max-update 300000 --max-tokens 4096 \
        --save-dir "$SAVE" $EXTRA
    fi
    python -m efficient_attention_tpu.cli.generate $DATA_FLAGS \
      $ENC_FLAGS --attn-name-decoder causal_eva \
      --decoder-attn-window-size 16 --decoder-attn-chunk-size 8 \
      --decoder-attn-adaptive-proj qk --decoder-attn-causal \
      --share-all-embeddings \
      --path "$SAVE/ckpt" --num-avg-checkpoints 10 \
      --beam 4 --lenpen 0.6 --remove-bpe \
      --results-path "$SAVE/gen.out" $EXTRA
    # "compound split" tokenized BLEU (reference main.sh:176)
    echo "--------------> compound split BLEU <----------------"
    bash "$(dirname "$0")/scripts/compound_split_bleu.sh" "$SAVE/gen.out"
    ;;

  *)
    echo "unknown dataset '$DATASET' (use imagenet|wikitext103|wmt)"
    exit 1
    ;;
esac
