"""Tiny-corpus end-to-end language pipelines.

The reference's ``fairseq/tests/test_binaries.py:234,1118`` pattern: run
preprocess -> train -> {eval_lm | generate+BLEU} fully in-process on a
50-sentence corpus, asserting the model actually learned (ppl far below
uniform / BLEU far above chance) — the class of CLI/data-pipeline
regressions unit tests cannot catch.
"""
import math
import os

import numpy as np
import pytest

WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "in", "park",
         "bird", "flew", "over", "tree"]


def _write_lm_corpus(path, n=50, seed=0):
    rng = np.random.default_rng(seed)
    # highly learnable: short cyclic patterns
    with open(path, "w", encoding="utf-8") as f:
        for i in range(n):
            start = int(rng.integers(0, len(WORDS)))
            sent = [WORDS[(start + j) % len(WORDS)] for j in range(8)]
            f.write(" ".join(sent) + "\n")


def _write_mt_corpus(prefix, n=50, seed=0):
    rng = np.random.default_rng(seed)
    with open(f"{prefix}.src", "w", encoding="utf-8") as fs, \
            open(f"{prefix}.tgt", "w", encoding="utf-8") as ft:
        for _ in range(n):
            k = int(rng.integers(2, 6))
            idx = rng.integers(0, len(WORDS), k)
            src = [WORDS[i] for i in idx]
            # "translation" = reversed source (deterministic, learnable)
            fs.write(" ".join(src) + "\n")
            ft.write(" ".join(reversed(src)) + "\n")


@pytest.mark.timeout(600)
def test_lm_pipeline_preprocess_train_eval(tmp_path):
    from efficient_attention_tpu.cli import eval_lm, preprocess, train_lm

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for split in ("train", "valid", "test"):
        _write_lm_corpus(corpus / f"{split}.txt", n=50)
    dest = str(tmp_path / "bin")
    preprocess.cli_main([
        "--trainpref", str(corpus / "train.txt"),
        "--validpref", str(corpus / "valid.txt"),
        "--testpref", str(corpus / "test.txt"),
        "--destdir", dest,
    ])
    assert os.path.exists(os.path.join(dest, "dict.txt"))
    assert os.path.exists(os.path.join(dest, "train.bin"))

    save_dir = str(tmp_path / "lm_ckpt")
    common = [
        "--data", dest, "--tokens-per-sample", "16", "--max-tokens", "128",
        "--decoder-embed-dim", "32", "--decoder-ffn-embed-dim", "64",
        "--decoder-layers", "1", "--decoder-attention-heads", "2",
        "--criterion", "cross_entropy", "--dropout", "0.0",
        "--max-len", "64", "--save-dir", save_dir,
    ]
    stats = train_lm.cli_main(common + [
        "--optimizer", "adamw", "--lr", "5e-3",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-update", "60", "--log-interval", "20",
        "--save-interval-updates", "20",
    ])
    assert stats["step"] == 60
    # the cyclic corpus is near-deterministic; a learning model gets well
    # below uniform ppl (~17) quickly
    assert stats["ppl"] < 8.0, stats
    # in-train validation ran on the valid split (fairseq
    # validate_and_save) and the model generalizes on the cyclic corpus
    assert stats["valid_ppl"] < 10.0, stats

    result = eval_lm.cli_main(common + [
        "--optimizer", "adamw", "--lr-scheduler", "inverse_sqrt",
        "--max-update", "60",
        "--checkpoint", os.path.join(save_dir, "ckpt"),
        "--context-window", "8",
        "--split", "test",
    ])
    assert math.isfinite(result["ppl"])
    assert result["ppl"] < 10.0, result


@pytest.mark.timeout(600)
def test_mt_pipeline_preprocess_train_generate(tmp_path):
    from efficient_attention_tpu.cli import generate, preprocess, train_mt
    from efficient_attention_tpu.scoring.bleu import BleuScorer  # noqa: F401

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for split in ("train", "valid", "test"):
        _write_mt_corpus(str(corpus / split), n=50)
    dest = str(tmp_path / "bin")
    preprocess.cli_main([
        "--trainpref", str(corpus / "train"),
        "--validpref", str(corpus / "valid"),
        "--testpref", str(corpus / "test"),
        "--destdir", dest, "-s", "src", "-t", "tgt",
        "--joined-dictionary",
    ])
    assert os.path.exists(os.path.join(dest, "dict.src.txt"))
    assert os.path.exists(os.path.join(dest, "train.tgt.bin"))

    save_dir = str(tmp_path / "mt_ckpt")
    common = [
        "--data", dest, "-s", "src", "-t", "tgt",
        "--encoder-embed-dim", "32", "--encoder-ffn-embed-dim", "64",
        "--encoder-layers", "1", "--encoder-attention-heads", "2",
        "--dropout", "0.0", "--max-tokens", "256", "--max-len", "32",
        "--save-dir", save_dir,
    ]
    stats = train_mt.cli_main(common + [
        "--optimizer", "adam", "--lr", "5e-3", "--warmup-updates", "5",
        "--max-update", "80", "--log-interval", "40",
        "--save-interval-updates", "20", "--label-smoothing", "0.0",
        "--eval-bleu", "--eval-bleu-args", '{"beam": 2, "max_len_b": 16}',
        "--eval-bleu-subset-size", "16",
    ])
    assert math.isfinite(stats["loss"])
    # in-train validation ran at the epoch boundary (fairseq
    # validate_and_save + translation-task --eval-bleu)
    assert math.isfinite(stats["valid_loss"])
    # reversal task after 80 updates: far above chance BLEU on valid too
    assert stats["valid_bleu"] > 10.0, stats

    result = generate.cli_main(common + [
        "--optimizer", "adam", "--max-update", "80",
        "--path", os.path.join(save_dir, "ckpt"),
        "--beam", "2", "--max-len-b", "16", "--gen-subset-size", "16",
        "--gen-batch", "8",
    ])
    assert result["sentences"] == 16
    # reversing 2-5 known words after 80 updates: far above chance BLEU
    assert result["bleu"] > 10.0, result

    # interactive with lexical constraints: the constraint word must appear
    # in the hypothesis even though the model would not produce it freely
    # (fairseq_cli/interactive.py --constraints)
    import io
    import sys as _sys

    from efficient_attention_tpu.cli import interactive

    stdin, stdout = _sys.stdin, _sys.stdout
    try:
        _sys.stdin = io.StringIO("the cat sat\tbird\n")
        _sys.stdout = io.StringIO()
        interactive.cli_main(common + [
            "--optimizer", "adam", "--max-update", "80",
            "--path", os.path.join(save_dir, "ckpt"),
            "--beam", "2", "--max-len-b", "16", "--constraints",
        ])
        out = _sys.stdout.getvalue()
    finally:
        _sys.stdin, _sys.stdout = stdin, stdout
    hyp_lines = [l for l in out.splitlines() if l.startswith("H-")]
    assert len(hyp_lines) == 1 and "bird" in hyp_lines[0], out


@pytest.mark.timeout(600)
def test_lm_resume_is_bit_stable(tmp_path):
    """``fairseq/tests/test_reproducibility.py`` analogue: training 20
    steps straight and training 10 + resume + 10 must land on the exact
    same loss (checkpoint restores the full optimizer state, and the batch
    order replays deterministically from (seed, step))."""
    from efficient_attention_tpu.cli import train_lm

    common = [
        "--dummy-data", "--dummy-vocab", "200", "--tokens-per-sample", "32",
        "--max-tokens", "128", "--decoder-embed-dim", "32",
        "--decoder-ffn-embed-dim", "64", "--decoder-layers", "1",
        "--decoder-attention-heads", "2", "--dropout", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--warmup-updates", "2",
        "--log-interval", "10", "--save-interval-updates", "10",
        "--seed", "7",
    ]
    straight = train_lm.cli_main(
        common + ["--max-update", "20",
                  "--save-dir", str(tmp_path / "a")])
    first = train_lm.cli_main(
        common + ["--max-update", "10",
                  "--save-dir", str(tmp_path / "b")])
    assert first["step"] == 10
    resumed = train_lm.cli_main(
        common + ["--max-update", "20",
                  "--save-dir", str(tmp_path / "b")])
    assert resumed["step"] == 20 and straight["step"] == 20
    assert resumed["loss"] == straight["loss"], (straight, resumed)


@pytest.mark.timeout(600)
def test_mt_resume_is_bit_stable(tmp_path):
    """Same reproducibility contract for the MT trainer (its skip-forward
    replays the seed-driven epoch/batch shuffle)."""
    from efficient_attention_tpu.cli import train_mt

    common = [
        "--dummy-data", "--dummy-vocab", "100", "--max-tokens", "128",
        "--max-len", "16", "--encoder-embed-dim", "32",
        "--encoder-ffn-embed-dim", "64", "--encoder-layers", "1",
        "--encoder-attention-heads", "2", "--dropout", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--warmup-updates", "2",
        "--log-interval", "10", "--save-interval-updates", "8",
        "--label-smoothing", "0.1", "--seed", "3",
    ]
    straight = train_mt.cli_main(
        common + ["--max-update", "16", "--save-dir", str(tmp_path / "a")])
    train_mt.cli_main(
        common + ["--max-update", "8", "--save-dir", str(tmp_path / "b")])
    resumed = train_mt.cli_main(
        common + ["--max-update", "16", "--save-dir", str(tmp_path / "b")])
    assert resumed["step"] == 16 and straight["step"] == 16
    assert resumed["loss"] == straight["loss"], (straight, resumed)


def test_lm_store_ema_tracks_and_persists(tmp_path):
    """--store-ema on the LM trainer keeps an EMA copy in the TrainState
    and the checkpoint (fairseq EMA, dataclass/configs.py:1057-1082)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_attention_tpu.cli import train_lm
    from efficient_attention_tpu.training import (
        CheckpointManager,
        TrainState,
        make_optimizer,
    )

    save_dir = tmp_path / "ema_ckpt"
    argv = [
        "--dummy-data", "--dummy-vocab", "64", "--max-update", "3",
        "--max-tokens", "128", "--tokens-per-sample", "16",
        "--decoder-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--decoder-layers", "1", "--decoder-attention-heads", "2",
        "--criterion", "cross_entropy", "--optimizer", "adamw",
        "--lr", "1e-2", "--lr-scheduler", "inverse_sqrt",
        "--store-ema", "--ema-decay", "0.5",
        "--save-dir", str(save_dir), "--save-interval-updates", "1",
        "--log-interval", "10", "--disable-validation",
    ]
    train_lm.cli_main(argv)

    args = train_lm.parse_args(argv)
    _, _, vocab = train_lm.load_corpus(args)
    model = train_lm.build_model(args, vocab)
    dummy = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(args.seed), dummy)
    from efficient_attention_tpu.training import inverse_sqrt_schedule
    schedule = inverse_sqrt_schedule(args.lr, args.warmup_updates,
                                     args.warmup_init_lr)
    tx = make_optimizer("adamw", schedule, weight_decay=0.0,
                        clip_grad=args.clip_norm, params_for_mask=params)
    template = TrainState.create(model.apply, params, tx, ema_decay=0.5)
    mgr = CheckpointManager(str(save_dir / "ckpt"))
    state = mgr.restore(template, step=mgr.latest_step())
    assert state.ema_params is not None
    p_leaves = jax.tree_util.tree_leaves(state.params)
    e_leaves = jax.tree_util.tree_leaves(state.ema_params)
    assert all(np.isfinite(np.asarray(e)).all() for e in e_leaves)
    # after 3 updates with decay 0.5 the EMA lags the live params
    diffs = [float(np.abs(np.asarray(p) - np.asarray(e)).max())
             for p, e in zip(p_leaves, e_leaves)]
    assert max(diffs) > 0.0


@pytest.mark.timeout(600)
def test_inference_cli_surface(tmp_path, capsys):
    """Round-3 inference-CLI parity flags in one short pipeline:

    - ``eval_lm --softmax-batch/--output-word-stats`` (fairseq EvalLM
      config ``configs.py:1016-1040``): row-sliced softmax must give the
      SAME ppl as the unsliced run, and word stats print.
    - ``eval_lm --decoder-layers-to-keep`` (prune_state_dict): keeping
      every layer of the checkpoint matches the unpruned ppl exactly.
    - ``generate --score-reference`` (SequenceScorer): references score
      100 BLEU against themselves and P- lines appear in gen.out.
    - ``generate --no-repeat-ngram-size`` runs through the blocker.
    """
    from efficient_attention_tpu.cli import (
        eval_lm,
        generate,
        preprocess,
        train_lm,
        train_mt,
    )

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for split in ("train", "valid", "test"):
        _write_lm_corpus(corpus / f"{split}.txt", n=30)
    dest = str(tmp_path / "bin")
    preprocess.cli_main([
        "--trainpref", str(corpus / "train.txt"),
        "--validpref", str(corpus / "valid.txt"),
        "--testpref", str(corpus / "test.txt"),
        "--destdir", dest,
    ])
    save_dir = str(tmp_path / "lm_ckpt")
    common = [
        "--data", dest, "--tokens-per-sample", "16", "--max-tokens", "128",
        "--decoder-embed-dim", "32", "--decoder-ffn-embed-dim", "64",
        "--decoder-layers", "2", "--decoder-attention-heads", "2",
        "--criterion", "cross_entropy", "--dropout", "0.0",
        "--max-len", "64", "--save-dir", save_dir,
        "--optimizer", "adamw", "--lr-scheduler", "inverse_sqrt",
    ]
    train_lm.cli_main(common + [
        "--lr", "5e-3", "--warmup-updates", "2", "--max-update", "10",
        "--log-interval", "10", "--save-interval-updates", "10",
        "--disable-validation",
    ])
    eval_common = common + [
        "--max-update", "10",
        "--checkpoint", os.path.join(save_dir, "ckpt"), "--split", "test",
    ]
    plain = eval_lm.cli_main(eval_common)
    sliced = eval_lm.cli_main(eval_common + ["--softmax-batch", "16"])
    assert abs(plain["ppl"] - sliced["ppl"]) < 1e-3 * plain["ppl"]

    capsys.readouterr()
    stats = eval_lm.cli_main(eval_common + ["--output-word-stats"])
    out = capsys.readouterr().out
    assert "avg_log_prob" in out
    assert abs(stats["ppl"] - plain["ppl"]) < 1e-6 * plain["ppl"]

    # identity prune (keep both layers) == full model
    pruned = eval_lm.cli_main(eval_common + ["--decoder-layers-to-keep",
                                             "0,1"])
    assert abs(pruned["ppl"] - plain["ppl"]) < 1e-6 * plain["ppl"]
    # real prune: shallower model still evaluates finitely
    one = eval_lm.cli_main(eval_common + ["--decoder-layers-to-keep", "1"])
    assert math.isfinite(one["ppl"])

    # ---- MT: score-reference + ngram blocker ----
    for split in ("train", "valid", "test"):
        _write_mt_corpus(str(corpus / split), n=30)
    mt_dest = str(tmp_path / "mt_bin")
    preprocess.cli_main([
        "--trainpref", str(corpus / "train"),
        "--validpref", str(corpus / "valid"),
        "--testpref", str(corpus / "test"),
        "--destdir", mt_dest, "-s", "src", "-t", "tgt",
        "--joined-dictionary",
    ])
    mt_save = str(tmp_path / "mt_ckpt")
    mt_common = [
        "--data", mt_dest, "-s", "src", "-t", "tgt",
        "--encoder-embed-dim", "32", "--encoder-ffn-embed-dim", "64",
        "--encoder-layers", "1", "--encoder-attention-heads", "2",
        "--dropout", "0.0", "--max-tokens", "256", "--max-len", "32",
        "--save-dir", mt_save, "--optimizer", "adam",
    ]
    train_mt.cli_main(mt_common + [
        "--lr", "5e-3", "--warmup-updates", "2", "--max-update", "10",
        "--log-interval", "10", "--save-interval-updates", "10",
        "--label-smoothing", "0.0", "--disable-validation",
    ])
    gen_out = str(tmp_path / "gen.out")
    scored = generate.cli_main(mt_common + [
        "--max-update", "10", "--path", os.path.join(mt_save, "ckpt"),
        "--gen-subset-size", "8", "--gen-batch", "8",
        "--score-reference", "--results-path", gen_out,
    ])
    # hypothesis IS the reference -> BLEU 100
    assert scored["bleu"] > 99.9, scored
    lines = open(gen_out).read()
    assert "P-0\t" in lines and "H-0\t" in lines

    nbest_out = str(tmp_path / "gen_nbest.out")
    blocked = generate.cli_main(mt_common + [
        "--max-update", "10", "--path", os.path.join(mt_save, "ckpt"),
        "--beam", "2", "--max-len-b", "16", "--gen-subset-size", "8",
        "--gen-batch", "8", "--no-repeat-ngram-size", "2",
        "--nbest", "2", "--unkpen", "0.5", "--unnormalized",
        "--print-alignment", "hard",
        "--results-path", nbest_out,
    ])
    assert scored["sentences"] == 8 and blocked["sentences"] == 8
    lines = open(nbest_out).read().splitlines()
    # --nbest 2: two H- lines per sentence
    h0 = [ln for ln in lines if ln.startswith("H-0\t")]
    assert len(h0) == 2, h0
    # --print-alignment: one A- line per sentence, src-tgt index pairs
    a0 = [ln for ln in lines if ln.startswith("A-0\t")]
    assert len(a0) == 1 and "-" in a0[0].split("\t")[1], a0

    # ---- LM shallow fusion (fairseq --lm-path/--lm-weight): train a tiny
    # LM on the target side (binarized against the MT joint vocab via the
    # --srcdict reuse path) and decode with the fused score ----
    lm_bin = str(tmp_path / "lm_bin")
    preprocess.cli_main([
        "--trainpref", str(corpus / "train.tgt"), "--destdir", lm_bin,
        "--srcdict", os.path.join(mt_dest, "dict.tgt.txt"),
    ])
    lm_save = str(tmp_path / "fusion_lm")
    lm_yaml = tmp_path / "fusion_lm.yaml"
    lm_yaml.write_text(
        "decoder-embed-dim: 32\ndecoder-ffn-embed-dim: 64\n"
        "decoder-layers: 1\ndecoder-attention-heads: 2\n"
        "criterion: cross_entropy\nmax-len: 64\n")
    train_lm.cli_main([
        "--data", lm_bin, "--config", str(lm_yaml),
        "--tokens-per-sample", "16", "--max-tokens", "128",
        "--optimizer", "adamw", "--lr", "5e-3",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
        "--max-update", "10", "--save-interval-updates", "10",
        "--log-interval", "10", "--disable-validation",
        "--save-dir", lm_save,
    ])
    fused = generate.cli_main(mt_common + [
        "--max-update", "10", "--path", os.path.join(mt_save, "ckpt"),
        "--beam", "2", "--max-len-b", "16", "--gen-subset-size", "8",
        "--gen-batch", "8",
        "--lm-path", os.path.join(lm_save, "ckpt"),
        "--lm-config", str(lm_yaml), "--lm-weight", "0.1",
    ])
    assert fused["sentences"] == 8 and math.isfinite(fused["bleu"])

    # ---- interactive --input FILE --buffer-size (batched buffering,
    # fairseq InteractiveConfig) ----
    import io
    import sys as _sys

    from efficient_attention_tpu.cli import interactive

    infile = tmp_path / "inter.txt"
    infile.write_text("the cat sat\ndog ran in park\nbird flew\n")
    stdout = _sys.stdout
    try:
        _sys.stdout = io.StringIO()
        interactive.cli_main(mt_common + [
            "--max-update", "10", "--path", os.path.join(mt_save, "ckpt"),
            "--beam", "2", "--max-len-b", "16",
            "--input", str(infile), "--buffer-size", "2",
        ])
        out = _sys.stdout.getvalue()
    finally:
        _sys.stdout = stdout
    h = [ln for ln in out.splitlines() if ln.startswith("H-")]
    assert len(h) == 3, out


def test_preprocess_dict_reuse_and_dict_only(tmp_path):
    """fairseq preprocess options: --srcdict/--tgtdict reuse,
    --thresholdtgt/--nwordstgt per-side pruning, --dict-only."""
    from efficient_attention_tpu.cli import preprocess
    from efficient_attention_tpu.data.dictionary import Dictionary

    corpus = tmp_path / "c"
    corpus.mkdir()
    _write_mt_corpus(str(corpus / "train"), n=30)
    _write_mt_corpus(str(corpus / "valid"), n=10)

    # 1) --dict-only with per-side nwords: dictionaries written, no bins
    d1 = str(tmp_path / "dict_only")
    preprocess.cli_main([
        "--trainpref", str(corpus / "train"), "--destdir", d1,
        "-s", "src", "-t", "tgt", "--nwordssrc", "12", "--nwordstgt", "8",
        "--dict-only",
    ])
    assert os.path.exists(os.path.join(d1, "dict.src.txt"))
    assert not os.path.exists(os.path.join(d1, "train.src.bin"))
    dsrc = Dictionary.load(os.path.join(d1, "dict.src.txt"))
    dtgt = Dictionary.load(os.path.join(d1, "dict.tgt.txt"))
    # nwords caps the TOTAL dictionary size, specials included, then the
    # vocab pads to a multiple of 8 with madeupwords (fairseq
    # Dictionary.finalize semantics; the padding keeps embeddings
    # MXU-aligned)
    assert len(dsrc) == 16 and len(dtgt) == 8
    assert dsrc[12].startswith("madeupword")

    # 2) --srcdict/--tgtdict reuse: binarize against the pruned vocabs
    d2 = str(tmp_path / "reuse")
    preprocess.cli_main([
        "--trainpref", str(corpus / "train"),
        "--validpref", str(corpus / "valid"), "--destdir", d2,
        "-s", "src", "-t", "tgt",
        "--srcdict", os.path.join(d1, "dict.src.txt"),
        "--tgtdict", os.path.join(d1, "dict.tgt.txt"),
    ])
    assert os.path.exists(os.path.join(d2, "train.src.bin"))
    reloaded = Dictionary.load(os.path.join(d2, "dict.src.txt"))
    assert len(reloaded) == len(dsrc)


def test_mt_batch_size_guard_and_stop_time(tmp_path):
    """--batch-size below devices*update-freq must error loudly (it would
    otherwise spin forever producing zero-sentence batches), and
    --stop-time-hours stops a run mid-training."""
    from efficient_attention_tpu.cli import train_mt

    common = [
        "--dummy-data", "--dummy-vocab", "64",
        "--encoder-embed-dim", "32", "--encoder-ffn-embed-dim", "64",
        "--encoder-layers", "1", "--encoder-attention-heads", "2",
        "--max-tokens", "256", "--max-len", "32", "--optimizer", "adam",
        "--lr", "1e-3", "--disable-validation", "--no-save",
        "--save-dir", str(tmp_path / "g"),
    ]
    with pytest.raises(ValueError, match="batch-size"):
        train_mt.cli_main(common + ["--max-update", "2",
                                    "--batch-size", "1",
                                    "--update-freq", "4"])
    # ~0.4ms wall budget: stops after the first step instead of 500
    stats = train_mt.cli_main(common + [
        "--max-update", "500", "--stop-time-hours", "1e-7"])
    assert stats.get("time_stop") and stats["step"] < 500


@pytest.mark.timeout(600)
def test_mt_max_epoch_counts_total_epochs_across_resume(tmp_path):
    """--max-epoch counts epochs of the whole run, not epochs since a
    restart: resume replays the deterministic epoch/batch structure, so
    the epoch counter lands where the interrupted run left off
    (ADVICE r3 resume-semantics check)."""
    from efficient_attention_tpu.cli import train_mt

    common = [
        "--dummy-data", "--dummy-vocab", "100", "--max-tokens", "128",
        "--max-len", "16", "--encoder-embed-dim", "32",
        "--encoder-ffn-embed-dim", "64", "--encoder-layers", "1",
        "--encoder-attention-heads", "2", "--dropout", "0.0",
        "--optimizer", "adam", "--lr", "1e-3", "--warmup-updates", "2",
        "--log-interval", "50", "--save-interval-updates", "1",
        "--label-smoothing", "0.1", "--seed", "3",
        "--max-update", "10000",
    ]
    two = train_mt.cli_main(
        common + ["--max-epoch", "2", "--save-dir", str(tmp_path / "a")])
    one = train_mt.cli_main(
        common + ["--max-epoch", "1", "--save-dir", str(tmp_path / "b")])
    assert 0 < one["step"] < two["step"]
    resumed = train_mt.cli_main(
        common + ["--max-epoch", "2", "--save-dir", str(tmp_path / "b")])
    # the resumed run must stop at the SAME total step as the straight
    # 2-epoch run — an epoch counter restarting at 0 would train one
    # extra epoch here
    assert resumed["step"] == two["step"], (one, resumed, two)


@pytest.mark.timeout(600)
def test_lm_finetune_from_model_with_layers_to_keep(tmp_path):
    """--finetune-from-model + --decoder-layers-to-keep: the full-depth
    warm-start checkpoint is pruned to the kept layers before loading
    (fairseq prune_state_dict runs on every load; ADVICE r3)."""
    from efficient_attention_tpu.cli import train_lm

    common = [
        "--dummy-data", "--dummy-vocab", "100", "--tokens-per-sample", "16",
        "--max-tokens", "64", "--decoder-embed-dim", "32",
        "--decoder-ffn-embed-dim", "64", "--decoder-attention-heads", "2",
        "--dropout", "0.0", "--optimizer", "adam", "--lr", "1e-3",
        "--warmup-updates", "2", "--log-interval", "10",
        "--save-interval-updates", "2", "--seed", "11",
    ]
    full = train_lm.cli_main(common + [
        "--decoder-layers", "2", "--max-update", "4",
        "--save-dir", str(tmp_path / "full")])
    assert full["step"] == 4
    pruned = train_lm.cli_main(common + [
        "--decoder-layers", "2", "--decoder-layers-to-keep", "1",
        "--finetune-from-model", str(tmp_path / "full" / "ckpt"),
        "--max-update", "2", "--save-dir", str(tmp_path / "pruned")])
    assert pruned["step"] == 2 and math.isfinite(pruned["loss"])
