"""MT training CLI — ``fairseq_cli/train.py`` for the translation task.

Reproduces the WMT14 EN-DE recipe surface (``main.sh:127-159``): efficient
encoder attention via ``--attn-name-encoder`` + nested ``--encoder-attn-*``
flags, ``causal_eva``/``softmax`` decoder, adam + inverse-sqrt, token-budget
batches with length sorting, label-smoothed CE, update-freq accumulation,
checkpointing (avg-last-N happens in ``generate.py``).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("eatpu-train-mt", add_help=False)
    p.add_argument("--data", default=None)
    p.add_argument("--dummy-data", action="store_true")
    p.add_argument("--dummy-vocab", type=int, default=256)
    p.add_argument("--source-lang", "-s", default="en")
    p.add_argument("--target-lang", "-t", default="de")
    p.add_argument("--arch", default="transformer_wmt_en_de",
                   help="named architecture preset (fairseq "
                        "register_model_architecture): transformer, "
                        "transformer_wmt_en_de[_big], "
                        "transformer_iwslt_de_en, "
                        "transformer_vaswani_wmt_en_{de,fr}_big; "
                        "explicit flags win")
    p.add_argument("--attn-name-encoder", default="softmax")
    p.add_argument("--attn-name-decoder", default="softmax",
                   choices=["softmax", "causal_eva"])
    p.add_argument("--encoder-embed-dim", type=int, default=512)
    p.add_argument("--encoder-ffn-embed-dim", type=int, default=2048)
    p.add_argument("--encoder-layers", type=int, default=6)
    p.add_argument("--decoder-layers", type=int, default=None,
                   help="decoder depth (defaults to --encoder-layers)")
    p.add_argument("--encoder-attention-heads", type=int, default=8)
    p.add_argument("--encoder-layers-to-keep", default=None,
                   help="comma-separated encoder layer indices to keep "
                        "when loading a full-depth checkpoint (fairseq "
                        "prune_state_dict); e.g. '0,2,4'")
    p.add_argument("--activation-fn", default="relu",
                   choices=["relu", "gelu", "gelu_fast", "gelu_accurate",
                            "relu_squared", "tanh", "linear"],
                   help="FFN activation (fairseq --activation-fn)")
    p.add_argument("--encoder-learned-pos", action="store_true")
    p.add_argument("--decoder-learned-pos", action="store_true")
    p.add_argument("--quant-noise-pq", type=float, default=0.0,
                   help="iPQ quantization noise: drop this fraction of "
                        "block_size-wide weight blocks during training "
                        "(fairseq modules/quant_noise.py)")
    p.add_argument("--quant-noise-pq-block-size", type=int, default=8)
    p.add_argument("--decoder-layers-to-keep", default=None)
    p.add_argument("--share-all-embeddings", action="store_true",
                   help="one embedding table for encoder/decoder/output "
                        "(the WMT recipe, reference main.sh:147; requires "
                        "a joint vocabulary)")
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--checkpoint-activations", action="store_true",
                   help="rematerialize each layer in the backward "
                        "(nn.remat) instead of storing activations "
                        "(reference transformer_config.py:165)")
    p.add_argument("--encoder-layerdrop", type=float, default=0.0,
                   help="LayerDrop probability for encoder layers "
                        "(fairseq LayerDropModuleList)")
    p.add_argument("--decoder-layerdrop", type=float, default=0.0)
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--max-tokens", type=int, default=4096)
    p.add_argument("--batch-size", "--max-sentences", type=int,
                   default=None, dest="batch_size",
                   help="cap sentences per batch alongside the token "
                        "budget (fairseq --batch-size/--max-sentences)")
    p.add_argument("--update-freq", type=int, default=1)
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--adam-betas", default="(0.9, 0.98)")
    p.add_argument("--lr", type=float, default=7e-4)
    p.add_argument("--warmup-updates", type=int, default=6000)
    p.add_argument("--warmup-init-lr", type=float, default=1e-7)
    p.add_argument("--max-update", type=int, default=300000)
    p.add_argument("--clip-norm", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--save-dir", default="./checkpoints/mt")
    p.add_argument("--save-interval-updates", type=int, default=1000)
    p.add_argument("--keep-last-epochs", type=int, default=10)
    p.add_argument("--max-epoch", type=int, default=0,
                   help="stop after this many epochs (fairseq "
                        "--max-epoch; 0 = run to --max-update)")
    p.add_argument("--sentence-avg", action="store_true",
                   help="normalize the loss by sentences instead of "
                        "tokens (fairseq --sentence-avg)")
    p.add_argument("--finetune-from-model", default=None,
                   help="warm-start the PARAMETERS from this checkpoint "
                        "dir and train fresh (fairseq "
                        "--finetune-from-model); incompatible with "
                        "resuming")
    p.add_argument("--no-save", action="store_true",
                   help="never write checkpoints (fairseq --no-save)")
    p.add_argument("--stop-time-hours", type=float, default=-1,
                   help="stop training after this many wall-clock hours "
                        "(fairseq --stop-time-hours)")
    p.add_argument("--profile", nargs="?", const="/tmp/jax-trace",
                   default=None, metavar="LOGDIR",
                   help="capture a jax.profiler trace of the training "
                        "loop (fairseq --profile)")
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--max-nonfinite-skips", type=int, default=8,
                   help="abort after this many CONSECUTIVE skipped updates "
                        "(non-finite loss/grad -> skip + continue, the bf16 "
                        "analogue of fairseq trainer.py:911-920)")
    p.add_argument("--store-ema", action="store_true",
                   help="maintain an exponential moving average of the "
                        "params (fairseq EMA, dataclass/configs.py:"
                        "1057-1082); saved inside the checkpoint")
    p.add_argument("--ema-decay", type=float, default=0.9999,
                   help="EMA decay (fairseq --ema-decay)")
    p.add_argument("--disable-validation", action="store_true",
                   help="never run validation (fairseq --disable-validation)")
    p.add_argument("--validate-interval-updates", type=int, default=0,
                   help="also validate every N updates (fairseq "
                        "--validate-interval-updates; 0 = only at each "
                        "epoch end)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision: f32 master params, bf16 compute "
                        "(the TPU analogue of fairseq --fp16/--amp)")
    p.add_argument("--heartbeat-timeout", type=float, default=-1,
                   help="abort this rank if no training step completes "
                        "within this many seconds (fairseq "
                        "--heartbeat-timeout / DistributedTimeoutWrapper)")
    p.add_argument("--patience", type=int, default=-1,
                   help="early-stop after this many consecutive epoch "
                        "validations without valid-loss improvement "
                        "(fairseq --patience)")
    p.add_argument("--eval-bleu", action="store_true",
                   help="compute BLEU on the valid subset during "
                        "validation (fairseq translation task --eval-bleu, "
                        "reference tasks/translation.py:370-500)")
    p.add_argument("--eval-bleu-args", default=None,
                   help='JSON generation args, e.g. \'{"beam": 4, '
                        '"lenpen": 0.6, "max_len_b": 200}\'')
    p.add_argument("--eval-bleu-remove-bpe", nargs="?", const="@@ ",
                   default=None,
                   help="strip BPE before scoring (fairseq "
                        "--eval-bleu-remove-bpe)")
    p.add_argument("--eval-bleu-print-samples", action="store_true",
                   help="print one hypothesis/reference pair per "
                        "validation (fairseq --eval-bleu-print-samples)")
    p.add_argument("--eval-bleu-subset-size", type=int, default=64,
                   help="cap on valid sentences decoded for in-train BLEU")
    p.add_argument("--tensorboard-logdir", default="",
                   help="TensorBoard event dir (main.sh:152 parity)")
    p.add_argument("--wandb-project", default=None)
    p.add_argument("--azureml-logging", action="store_true")
    from efficient_attention_tpu.parallel import add_distributed_args
    add_distributed_args(p)
    return p


def parse_args(argv=None):
    from efficient_attention_tpu import AttentionFactory, NestedNamespace
    from efficient_attention_tpu.config_yaml import (
        add_config_flag,
        apply_yaml_config,
        preparse_overrides,
    )

    parser = build_parser()
    add_config_flag(parser)
    names = preparse_overrides(
        parser, argv, ["attn_name_encoder", "attn_name_decoder"])
    parser = AttentionFactory.add_attn_specific_args(
        parser, names["attn_name_encoder"], struct_name="attn_args_encoder",
        prefix="encoder-attn")
    parser = AttentionFactory.add_attn_specific_args(
        parser, names["attn_name_decoder"], struct_name="attn_args_decoder",
        prefix="decoder-attn")
    parser.add_argument("--help", action="help")
    args = parser.parse_args(argv, namespace=NestedNamespace())
    args.attn_name_encoder = names["attn_name_encoder"]
    args.attn_name_decoder = names["attn_name_decoder"]
    args = apply_yaml_config(args, parser, argv)
    from efficient_attention_tpu.models.archs import MT_ARCHS, apply_arch

    return apply_arch(args, parser, argv, MT_ARCHS)


def load_pairs(args, split: str = "train"):
    """Returns (src_dataset, tgt_dataset, src_dict, tgt_dict) for a split."""
    if args.dummy_data or not args.data:
        rng = np.random.default_rng(args.seed + (0 if split == "train" else 1))

        class _Dummy:
            def __init__(self, n=512, vmax=args.dummy_vocab):
                if split != "train":
                    n = 64
                self.seqs = [
                    np.concatenate([
                        rng.integers(4, vmax, size=rng.integers(5, 24)),
                        [2]]).astype(np.int64)
                    for _ in range(n)]

            def __len__(self):
                return len(self.seqs)

            def __getitem__(self, i):
                return self.seqs[i]

            @property
            def sizes(self):
                return np.asarray([len(s) for s in self.seqs])

        return _Dummy(), _Dummy(), None, None
    from efficient_attention_tpu.data.dictionary import Dictionary
    from efficient_attention_tpu.data.indexed_dataset import MMapIndexedDataset

    sd = Dictionary.load(os.path.join(args.data, f"dict.{args.source_lang}.txt"))
    td = Dictionary.load(os.path.join(args.data, f"dict.{args.target_lang}.txt"))
    src = MMapIndexedDataset(
        os.path.join(args.data, f"{split}.{args.source_lang}"))
    tgt = MMapIndexedDataset(
        os.path.join(args.data, f"{split}.{args.target_lang}"))
    return src, tgt, sd, td


def build_model(args, src_vocab, tgt_vocab):
    import argparse as _ap

    from efficient_attention_tpu.config import namespace_to_dict
    from efficient_attention_tpu.models.transformer import TransformerModel

    from efficient_attention_tpu.training.checkpoint import (
        parse_layers_to_keep,
    )

    enc_keep = parse_layers_to_keep(
        getattr(args, "encoder_layers_to_keep", None))
    dec_keep = parse_layers_to_keep(
        getattr(args, "decoder_layers_to_keep", None))
    dec_layers = getattr(args, "decoder_layers", None)
    if dec_layers is None:
        dec_layers = args.encoder_layers
    return TransformerModel(
        src_vocab_size=src_vocab, tgt_vocab_size=tgt_vocab,
        embed_dim=args.encoder_embed_dim,
        ffn_dim=args.encoder_ffn_embed_dim,
        num_layers=(len(enc_keep) if enc_keep else args.encoder_layers),
        num_decoder_layers=(len(dec_keep) if dec_keep else dec_layers),
        num_heads=args.encoder_attention_heads,
        attn_name_encoder=args.attn_name_encoder,
        attn_args_encoder=namespace_to_dict(
            getattr(args, "attn_args_encoder", _ap.Namespace())),
        attn_name_decoder=args.attn_name_decoder,
        attn_args_decoder=namespace_to_dict(
            getattr(args, "attn_args_decoder", _ap.Namespace())),
        dropout=args.dropout, max_len=args.max_len,
        share_all_embeddings=getattr(args, "share_all_embeddings", False),
        checkpoint_activations=getattr(args, "checkpoint_activations", False),
        encoder_layerdrop=getattr(args, "encoder_layerdrop", 0.0),
        decoder_layerdrop=getattr(args, "decoder_layerdrop", 0.0),
        quant_noise_pq=getattr(args, "quant_noise_pq", 0.0),
        quant_noise_pq_block_size=getattr(
            args, "quant_noise_pq_block_size", 8),
        activation_fn=getattr(args, "activation_fn", "relu"),
        encoder_learned_pos=getattr(args, "encoder_learned_pos", False),
        decoder_learned_pos=getattr(args, "decoder_learned_pos", False))


def main(args) -> dict:
    import ast

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from efficient_attention_tpu.data.text_data import (
        LanguagePairDataset,
        batch_by_size,
        collate_tokens,
    )
    from efficient_attention_tpu.parallel import batch_spec, make_mesh
    from efficient_attention_tpu.training import (
        CheckpointManager,
        MetricLogger,
        TrainState,
        inverse_sqrt_schedule,
        make_optimizer,
    )
    from efficient_attention_tpu.training.lm_steps import (
        make_mt_eval_step,
        make_mt_train_step,
    )

    src, tgt, sd, td = load_pairs(args)
    src_vocab = len(sd) if sd else args.dummy_vocab
    tgt_vocab = len(td) if td else args.dummy_vocab
    model = build_model(args, src_vocab, tgt_vocab)
    pairs = LanguagePairDataset(src, tgt)

    n_dev = len(jax.devices())
    mesh = make_mesh(data=-1)
    schedule = inverse_sqrt_schedule(args.lr, args.warmup_updates,
                                     args.warmup_init_lr)
    dummy_src = jnp.zeros((1, 16), jnp.int32)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(args.seed), dummy_src, dummy_src))()
    betas = ast.literal_eval(args.adam_betas)
    tx = make_optimizer(args.optimizer, schedule, weight_decay=0.0,
                        clip_grad=args.clip_norm or None,
                        params_for_mask=params, betas=tuple(betas))
    state = TrainState.create(
        model.apply, params, tx,
        ema_decay=args.ema_decay if args.store_ema else 0.0)
    train_step = make_mt_train_step(
        pad_idx=1, label_smoothing=args.label_smoothing,
        accum_steps=args.update_freq,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        sentence_avg=getattr(args, "sentence_avg", False))
    data_sharding = NamedSharding(mesh, batch_spec())
    repl = NamedSharding(mesh, P())
    jit_step = jax.jit(
        train_step,
        in_shardings=(repl, data_sharding, data_sharding, data_sharding, None),
        out_shardings=(repl, None), donate_argnums=(0,))
    state = jax.device_put(state, repl)

    os.makedirs(args.save_dir, exist_ok=True)
    ckpt = CheckpointManager(os.path.join(args.save_dir, "ckpt"),
                             keep_last=args.keep_last_epochs,
                             save_interval_steps=args.save_interval_updates)
    logger = MetricLogger()
    rng = jax.random.PRNGKey(args.seed)
    sizes = np.maximum(pairs.src_sizes, pairs.tgt_sizes)
    order_rng = np.random.default_rng(args.seed)
    stats = {}
    t0 = time.time()
    if getattr(args, "finetune_from_model", None):
        # params-only warm start (fairseq --finetune-from-model)
        if ckpt.latest_step() is not None:
            raise ValueError(
                "--finetune-from-model cannot be combined with resuming "
                "from --save-dir (fairseq raises the same conflict)")
        restored = CheckpointManager(
            os.path.abspath(args.finetune_from_model)).restore_params()
        if restored is None:
            raise FileNotFoundError(
                f"--finetune-from-model {args.finetune_from_model}: no "
                "checkpoint found")
        fstep, fparams = restored
        # prune a full-depth warm-start checkpoint down to any
        # --{encoder,decoder}-layers-to-keep subset the model was built
        # at (fairseq prune_state_dict runs on every load, ADVICE r3)
        from efficient_attention_tpu.training.checkpoint import (
            maybe_prune_for_keep,
            parse_layers_to_keep,
        )

        for flag, scope in (("encoder_layers_to_keep", "encoder"),
                            ("decoder_layers_to_keep", "decoder")):
            fparams = maybe_prune_for_keep(
                fparams, parse_layers_to_keep(getattr(args, flag, None)),
                scope)
        fparams = jax.device_put(fparams, repl)
        state = state.replace(
            params=fparams,
            ema_params=(fparams if state.ema_params is not None else None))
        print(f"| finetuning from {args.finetune_from_model} "
              f"(step {int(fstep)}); optimizer and schedule reset")
    # auto-resume (fairseq train.py:162): restore the newest checkpoint
    # and skip forward through the deterministic (seed-driven) batch
    # sequence to the restored step
    skip = ckpt.latest_step() or 0
    if skip > 0:
        state = ckpt.restore(state, step=skip)
        state = jax.device_put(state, repl)
        print(f"| resumed from checkpoint step {skip}")
    tb = None
    if getattr(args, "tensorboard_logdir", ""):
        from efficient_attention_tpu.training.tensorboard import SummaryWriter

        tb = SummaryWriter(args.tensorboard_logdir)
    wb = None
    if getattr(args, "wandb_project", None):
        from efficient_attention_tpu.training.wandb_sink import WandBLogger

        wb = WandBLogger(args.wandb_project, run_name="train_mt",
                         config=vars(args), log_dir=args.save_dir)
    aml = None
    if getattr(args, "azureml_logging", False):
        from efficient_attention_tpu.training.azureml_sink import AzureMLLogger

        aml = AzureMLLogger(True, log_dir=args.save_dir)
    # ---- validation (fairseq train.py validate_and_save; translation
    # task valid_step + optional --eval-bleu, translation.py:370-500) ----
    vsrc, vtgt, _, _ = load_pairs(args, split="valid")
    vpairs = LanguagePairDataset(vsrc, vtgt)
    eval_step = make_mt_eval_step(pad_idx=1,
                                  label_smoothing=args.label_smoothing)
    jit_eval = jax.jit(
        lambda p, s, pv, t: eval_step(p, model.apply, s, pv, t))
    # drop examples beyond the model's positional table, like fairseq's
    # max-positions filtering of the batch iterator (data_utils.py
    # filter_by_size; --skip-invalid-size-inputs-valid-test)
    vsizes = np.maximum(vpairs.src_sizes, vpairs.tgt_sizes)
    valid_ids = np.flatnonzero(vsizes <= args.max_len)
    gen_args = json.loads(args.eval_bleu_args) if args.eval_bleu_args else {}

    def bleu_validate(params) -> float:
        """In-train BLEU over a capped valid subset (translation.py
        ``_inference_with_bleu``): beam decode, optional BPE removal,
        corpus BLEU over the post-processed word sequences."""
        from efficient_attention_tpu.generation import SequenceGenerator
        from efficient_attention_tpu.models.transformer import (
            TransformerModel,
        )
        from efficient_attention_tpu.scoring.bleu import (
            BleuScorer,
            WordIdMapper,
        )

        K = int(gen_args.get("beam", 4))
        scorer = BleuScorer()
        word_ids = WordIdMapper()
        ids = valid_ids[: args.eval_bleu_subset_size].tolist()
        printed = False
        for i in range(0, len(ids), 8):
            chunk = ids[i: i + 8]
            samples = [vpairs[int(j)] for j in chunk]
            src_b = jnp.asarray(collate_tokens([s for s, _ in samples],
                                               pad_idx=1))
            enc_out, enc_pad = model.apply(params, src_b,
                                           method=TransformerModel.encode)
            enc_out_k = jnp.repeat(enc_out, K, axis=0)
            enc_pad_k = jnp.repeat(enc_pad, K, axis=0)

            def step_fn(cache, tokens, step):
                logits, cache = model.apply(
                    params, cache, tokens, step, enc_out_k, enc_pad_k,
                    method=TransformerModel.decode_step)
                return logits[:, 0], cache

            buf_len = (int(gen_args.get("max_len_a", 0) * src_b.shape[1])
                       + int(gen_args.get("max_len_b", 2 * src_b.shape[1])))
            gen = SequenceGenerator(
                step_fn,
                lambda bk, ml: model.apply(
                    params, bk, ml, method=TransformerModel.init_decode_state),
                vocab_size=tgt_vocab, beam_size=K, max_len=buf_len,
                len_penalty=float(gen_args.get("lenpen", 1.0)),
                pad=1, eos=2)
            tokens, _ = gen.generate(batch=src_b.shape[0])
            for b, j in enumerate(chunk):
                hyp = np.asarray(tokens[b, 0, 1:])
                eos_pos = np.where(hyp == 2)[0]
                if len(eos_pos):
                    hyp = hyp[: eos_pos[0]]
                ref = np.asarray(vpairs[int(j)][1])
                ref = ref[ref != 2]
                if td is not None:
                    hyp_s, ref_s = td.string(hyp), td.string(ref)
                    if args.eval_bleu_remove_bpe:
                        rb = args.eval_bleu_remove_bpe
                        hyp_s = (hyp_s + " ").replace(rb, "").rstrip()
                        ref_s = (ref_s + " ").replace(rb, "").rstrip()
                    if args.eval_bleu_print_samples and not printed:
                        print(f"| example hypothesis: {hyp_s}")
                        print(f"| example reference:  {ref_s}")
                        printed = True
                    scorer.add(word_ids(ref_s), word_ids(hyp_s))
                else:
                    if args.eval_bleu_print_samples and not printed:
                        print(f"| example hypothesis: {hyp.tolist()}")
                        print(f"| example reference:  {ref.tolist()}")
                        printed = True
                    scorer.add(ref.tolist(), hyp.tolist())
        return scorer.score()

    def validate(state) -> dict:
        if args.disable_validation:
            return {}
        loss_sum = nll_sum = tok_sum = 0.0
        vorder = valid_ids[np.argsort(vsizes[valid_ids], kind="stable")]
        for bidx in batch_by_size(vorder, vsizes, args.max_tokens):
            samples = [vpairs[int(i)] for i in bidx]
            s = jnp.asarray(collate_tokens([a for a, _ in samples], pad_idx=1))
            t = jnp.asarray(collate_tokens([b for _, b in samples], pad_idx=1))
            pv = jnp.asarray(collate_tokens(
                [b for _, b in samples], pad_idx=1,
                move_eos_to_beginning=True))
            ls, ns, nt = jit_eval(state.params, s, pv, t)
            loss_sum += float(ls)
            nll_sum += float(ns)
            tok_sum += float(nt)
        n = max(tok_sum, 1.0)
        vm = {"valid_loss": loss_sum / n,
              "valid_nll_loss": nll_sum / n,
              "valid_ppl": math.exp(min(nll_sum / n, 50.0))}
        if args.eval_bleu:
            vm["valid_bleu"] = bleu_validate(state.params)
        print("| valid " + " ".join(f"{k.removeprefix('valid_')} {v:.3f}"
                                    for k, v in vm.items()))
        return vm

    consec_skips = 0
    best_valid, bad_valids = float("inf"), 0
    from efficient_attention_tpu.utils.watchdog import maybe_paused

    watchdog = None
    if getattr(args, "heartbeat_timeout", -1) and args.heartbeat_timeout > 0:
        from efficient_attention_tpu.utils.watchdog import HeartbeatWatchdog

        watchdog = HeartbeatWatchdog(args.heartbeat_timeout)  # armed after step 1
        # (first-step XLA compilation must not count against the
        # timeout)
    train_ok = sizes <= args.max_len
    n_dropped = int((~train_ok).sum())
    if n_dropped:
        print(f"| WARNING: {n_dropped} train examples exceed --max-len "
              f"{args.max_len} and were dropped (fairseq max-positions "
              "filtering)")
    if getattr(args, "profile", None):
        from efficient_attention_tpu.utils.profiling import start_profile

        _prof = start_profile(args.profile)
        print(f"| profiler trace -> {args.profile}")
    else:
        _prof = None
    epoch = 0
    while int(state.step) < args.max_update:
        if stats.get("time_stop"):
            break
        epoch += 1
        if args.max_epoch and epoch > args.max_epoch:
            print(f"| stopping: --max-epoch {args.max_epoch} reached")
            break
        order = order_rng.permutation(len(pairs))
        order = order[train_ok[order]]
        order = order[np.argsort(sizes[order], kind="stable")]
        # each batch must split into update_freq microbatches that each
        # shard evenly over the devices
        quantum = n_dev * max(1, args.update_freq)
        if args.batch_size is not None and args.batch_size < quantum:
            # every batch would trim to zero sentences and the epoch loop
            # would spin without ever advancing a step
            raise ValueError(
                f"--batch-size {args.batch_size} must be >= devices x "
                f"update-freq ({quantum}): each batch must split into "
                "update_freq microbatches that shard over the devices")
        batches = batch_by_size(order, sizes, args.max_tokens,
                                max_sentences=args.batch_size,
                                required_multiple=quantum)
        order_rng.shuffle(batches)
        for bidx in batches:
            if int(state.step) >= args.max_update:
                break
            if len(bidx) % quantum != 0:
                bidx = bidx[: len(bidx) - (len(bidx) % quantum)]
            if len(bidx) == 0:
                continue
            if skip > 0:
                skip -= 1
                continue
            samples = [pairs[int(i)] for i in bidx]
            src_b = collate_tokens([s for s, _ in samples], pad_idx=1)
            tgt_b = collate_tokens([t for _, t in samples], pad_idx=1)
            prev_b = collate_tokens([t for _, t in samples], pad_idx=1,
                                    move_eos_to_beginning=True)
            state, metrics = jit_step(
                state, jnp.asarray(src_b), jnp.asarray(prev_b),
                jnp.asarray(tgt_b), rng)
            if metrics.skipped is not None and bool(metrics.skipped):
                consec_skips += 1
                print(f"| WARNING: non-finite loss/grad detected, skipping "
                      f"update ({consec_skips} consecutive)")
                if consec_skips >= args.max_nonfinite_skips:
                    raise FloatingPointError(
                        f"{consec_skips} consecutive non-finite updates; "
                        "aborting (fairseq: minimum loss scale reached)")
                continue
            consec_skips = 0
            step = int(state.step)
            loss = float(metrics.loss)
            logger.update(loss=loss, gnorm=float(metrics.grad_norm))
            if step % args.log_interval == 0:
                print(f"| step {step} {logger} "
                      f"| {time.time() - t0:.0f}s")
                scalars = {"loss": loss,
                           "gnorm": float(metrics.grad_norm)}
                if tb is not None:
                    tb.add_scalars(scalars, step=step)
                if wb is not None:
                    wb.log(scalars, step=step)
                if aml is not None:
                    aml.log(scalars, step=step)
            if watchdog is not None:
                watchdog.start().beat()
            if not args.no_save:
                with maybe_paused(watchdog):
                    ckpt.save(step, state)
            stats = {"step": step, "loss": loss}
            if (args.stop_time_hours > 0
                    and time.time() - t0 > args.stop_time_hours * 3600):
                print(f"| stopping: --stop-time-hours "
                      f"{args.stop_time_hours} reached")
                stats["time_stop"] = True
                break
            if (args.validate_interval_updates > 0
                    and step % args.validate_interval_updates == 0):
                # validation doesn't count toward --heartbeat-timeout
                # (the reference times only the module forward, ADVICE r3)
                with maybe_paused(watchdog):
                    vm = validate(state)
                stats.update(vm)
                for sink in (tb, wb, aml):
                    if sink is not None:
                        (sink.add_scalars if sink is tb else sink.log)(
                            vm, step=step)
        # epoch boundary: fairseq validates once per epoch
        # (train.py validate_and_save)
        if skip == 0 and int(state.step) > 0:
            with maybe_paused(watchdog):
                stats.update(validate(state))
            # fairseq --patience (should_stop_early)
            if args.patience > 0 and "valid_loss" in stats:
                if stats["valid_loss"] < best_valid - 1e-9:
                    best_valid, bad_valids = stats["valid_loss"], 0
                else:
                    bad_valids += 1
                    if bad_valids >= args.patience:
                        print(f"| early stop: valid loss has not improved "
                              f"for {bad_valids} epochs (--patience "
                              f"{args.patience})")
                        stats["early_stop"] = True
                        break
    if _prof is not None:
        _prof()
    if watchdog is not None:
        watchdog.stop()
    ckpt.wait()
    print(json.dumps(stats))
    return stats


def cli_main(argv=None):
    return main(parse_args(argv))


if __name__ == "__main__":
    cli_main()
