"""Language-model training CLI — ``fairseq_cli/train.py`` for the LM task.

Reproduces the wiki103 recipe surface (``main.sh:52-83``): causal-EVA or
softmax decoder attention selected by ``--attn-name-decoder`` with nested
``--decoder-attn-*`` flags, NAG + cosine(t-mult) or adamw, token-block
batching, adaptive softmax, update-freq grad accumulation, Orbax
checkpointing.  ``--dummy-data`` trains on synthetic tokens (the
``fairseq/benchmark/dummy_lm.py`` analogue) for perf/regression runs.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("eatpu-train-lm", add_help=False)
    p.add_argument("--data", default=None, help="binarized data dir")
    p.add_argument("--dummy-data", action="store_true")
    p.add_argument("--dummy-vocab", type=int, default=1000)
    p.add_argument("--attn-name-decoder", default="softmax",
                   choices=["softmax", "causal_eva"])
    p.add_argument("--arch", default=None,
                   help="named architecture preset (fairseq "
                        "register_model_architecture): transformer_lm, "
                        "transformer_lm_big, transformer_lm_wiki103, "
                        "transformer_lm_gpt, transformer_lm_gpt2_"
                        "{tiny,small,medium,big}; explicit flags win")
    p.add_argument("--decoder-embed-dim", type=int, default=1024)
    p.add_argument("--decoder-ffn-embed-dim", type=int, default=4096)
    p.add_argument("--decoder-layers", type=int, default=16)
    p.add_argument("--decoder-attention-heads", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--checkpoint-activations", action="store_true",
                   help="rematerialize each layer in the backward "
                        "(nn.remat) instead of storing activations "
                        "(reference transformer_config.py:165)")
    p.add_argument("--decoder-layerdrop", type=float, default=0.0,
                   help="LayerDrop probability for decoder layers "
                        "(fairseq LayerDropModuleList)")
    p.add_argument("--activation-fn", default="relu",
                   choices=["relu", "gelu", "gelu_fast", "gelu_accurate",
                            "relu_squared", "tanh", "linear"],
                   help="FFN activation (fairseq --activation-fn)")
    p.add_argument("--decoder-learned-pos", action="store_true",
                   help="learned positional embeddings instead of "
                        "sinusoidal (fairseq --decoder-learned-pos)")
    p.add_argument("--quant-noise-pq", type=float, default=0.0,
                   help="iPQ quantization noise: drop this fraction of "
                        "block_size-wide weight blocks during training "
                        "(fairseq modules/quant_noise.py)")
    p.add_argument("--quant-noise-pq-block-size", type=int, default=8)
    p.add_argument("--decoder-layers-to-keep", default=None,
                   help="comma-separated layer indices to keep when "
                        "loading a full-depth checkpoint into a shallower "
                        "model (fairseq prune_state_dict, "
                        "checkpoint_utils.py:674); e.g. '0,2,4'")
    p.add_argument("--tokens-per-sample", type=int, default=512)
    p.add_argument("--max-tokens", type=int, default=9216)
    p.add_argument("--update-freq", type=int, default=1)
    p.add_argument("--optimizer", default="nag",
                   choices=["nag", "adamw", "adam", "sgd", "adafactor"])
    p.add_argument("--lr", type=float, default=1.0)
    p.add_argument("--lr-scheduler", default="cosine",
                   choices=["cosine", "inverse_sqrt", "polynomial"])
    p.add_argument("--lr-period-updates", type=float, default=270000)
    p.add_argument("--t-mult", type=float, default=2.0)
    p.add_argument("--lr-shrink", type=float, default=0.75,
                   help="per-restart max/min lr shrink factor (recipe "
                        "main.sh:77 --lr-shrink 0.75)")
    p.add_argument("--warmup-updates", type=int, default=16000)
    p.add_argument("--warmup-init-lr", type=float, default=1e-7)
    p.add_argument("--min-lr", type=float, default=1e-9)
    p.add_argument("--max-update", type=int, default=286000)
    p.add_argument("--clip-norm", type=float, default=0.1)
    p.add_argument("--criterion", default="adaptive_loss",
                   choices=["adaptive_loss", "cross_entropy"])
    p.add_argument("--adaptive-cutoffs", default="20000,60000")
    p.add_argument("--adaptive-input", action="store_true",
                   help="adaptive input embeddings (wiki103 recipe, "
                        "fairseq --adaptive-input)")
    p.add_argument("--tie-adaptive-weights", action="store_true",
                   help="tie the adaptive softmax to the adaptive input "
                        "(fairseq --tie-adaptive-weights + "
                        "--tie-adaptive-proj, the published wiki103 config)")
    p.add_argument("--no-decoder-final-norm", action="store_true",
                   help="drop the final decoder LayerNorm (wiki103 arch)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--save-dir", default="./checkpoints/lm")
    p.add_argument("--save-interval-updates", type=int, default=1000)
    p.add_argument("--keep-interval-updates", type=int, default=3,
                   help="keep only the last N interval checkpoints "
                        "(fairseq --keep-interval-updates)")
    p.add_argument("--finetune-from-model", default=None,
                   help="warm-start the PARAMETERS from this checkpoint "
                        "dir and train fresh (fairseq "
                        "--finetune-from-model: optimizer/lr/dataloader "
                        "reset); incompatible with resuming")
    p.add_argument("--no-save", action="store_true",
                   help="never write checkpoints (fairseq --no-save)")
    p.add_argument("--stop-time-hours", type=float, default=-1,
                   help="stop training after this many wall-clock hours "
                        "(fairseq --stop-time-hours)")
    p.add_argument("--profile", nargs="?", const="/tmp/jax-trace",
                   default=None, metavar="LOGDIR",
                   help="capture a jax.profiler trace of the training "
                        "loop (fairseq --profile nvtx wrapping, "
                        "fairseq_cli/train.py:523-525); view in "
                        "TensorBoard/Perfetto")
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--max-len", type=int, default=3072)
    # BASE-layer MoE (reference transformer_lm.py:187-195)
    p.add_argument("--base-layers", type=int, default=0,
                   help="number of BASE MoE layers in the decoder")
    p.add_argument("--base-experts", type=int, default=0,
                   help="experts per BASE layer (0 = one per device, the "
                        "reference's one-expert-per-worker default)")
    p.add_argument("--base-sublayers", type=int, default=1)
    p.add_argument("--base-shuffle", action="store_true")
    p.add_argument("--seq-parallel", type=int, default=1,
                   help="shard the token dimension over a 'seq' mesh axis "
                        "of this size (causal_eva decoder only; the TPU "
                        "replacement for the reference's absent sequence "
                        "parallelism — local windows stay on-shard, only "
                        "chunk summaries are all-gathered)")
    p.add_argument("--pipeline-stages", type=int, default=1,
                   help="GPipe pipeline parallelism over a 'stage' mesh "
                        "axis (reference --pipeline-model-parallel, "
                        "fairseq/dataclass/configs.py:365-423)")
    p.add_argument("--pipeline-chunks", type=int, default=2,
                   help="microbatches per pipelined step (reference "
                        "--pipeline-chunks)")
    p.add_argument("--max-nonfinite-skips", type=int, default=8,
                   help="abort after this many CONSECUTIVE skipped updates "
                        "(non-finite loss/grad -> skip + continue, the bf16 "
                        "analogue of fairseq trainer.py:911-920; fairseq "
                        "aborts when the loss scale bottoms out)")
    p.add_argument("--store-ema", action="store_true",
                   help="maintain an exponential moving average of the "
                        "params (fairseq EMA, dataclass/configs.py:"
                        "1057-1082); saved inside the checkpoint")
    p.add_argument("--ema-decay", type=float, default=0.9999,
                   help="EMA decay (fairseq --ema-decay)")
    p.add_argument("--disable-validation", action="store_true",
                   help="never run validation (fairseq --disable-validation)")
    p.add_argument("--validate-interval-updates", type=int, default=0,
                   help="validate on the valid split every N updates "
                        "(fairseq --validate-interval-updates; 0 = only "
                        "once at the end of training)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision: f32 master params, bf16 compute "
                        "(the TPU analogue of fairseq --fp16/--amp; no "
                        "loss scaling needed in bf16)")
    p.add_argument("--heartbeat-timeout", type=float, default=-1,
                   help="abort this rank if no training step completes "
                        "within this many seconds (fairseq "
                        "--heartbeat-timeout / DistributedTimeoutWrapper: "
                        "surfaces hung collectives loudly)")
    p.add_argument("--patience", type=int, default=-1,
                   help="early-stop after this many consecutive "
                        "validations without valid-loss improvement "
                        "(fairseq --patience; requires "
                        "--validate-interval-updates)")
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
    # a YAML config may choose the attention class — honor it in the
    # two-pass registration unless the CLI names one explicitly
    names = preparse_overrides(parser, argv, ["attn_name_decoder"])
    parser = AttentionFactory.add_attn_specific_args(
        parser, names["attn_name_decoder"], struct_name="attn_args_decoder",
        prefix="decoder-attn")
    parser.add_argument("--help", action="help")
    args = parser.parse_args(argv, namespace=NestedNamespace())
    args.attn_name_decoder = names["attn_name_decoder"]
    args = apply_yaml_config(args, parser, argv)
    from efficient_attention_tpu.models.archs import LM_ARCHS, apply_arch

    return apply_arch(args, parser, argv, LM_ARCHS)


def load_corpus(args, split: str = "train"):
    if args.dummy_data or not args.data:
        rng = np.random.default_rng(
            args.seed + (0 if split == "train" else 1))
        vocab_size = args.dummy_vocab
        n = args.max_tokens * (64 if split == "train" else 4)
        tokens = rng.integers(4, vocab_size, size=n).astype(np.int64)
        return tokens, None, vocab_size
    from efficient_attention_tpu.data.dictionary import Dictionary
    from efficient_attention_tpu.data.indexed_dataset import MMapIndexedDataset

    d = Dictionary.load(os.path.join(args.data, "dict.txt"))
    ds = MMapIndexedDataset(os.path.join(args.data, split))
    return ds.flat_tokens(), d, len(d)


def build_model(args, vocab_size, seq_axis=None, dense_tokens=False):
    import argparse as _ap

    from efficient_attention_tpu.config import namespace_to_dict
    from efficient_attention_tpu.models.transformer import TransformerLM

    attn_args = namespace_to_dict(
        getattr(args, "attn_args_decoder", _ap.Namespace()))
    cutoffs = None
    if args.criterion == "adaptive_loss":
        cutoffs = tuple(
            c for c in (int(x) for x in args.adaptive_cutoffs.split(","))
            if c < vocab_size)
        if not cutoffs:
            cutoffs = None
    base_experts = getattr(args, "base_experts", 0)
    if getattr(args, "base_layers", 0) and not base_experts:
        import jax

        base_experts = jax.device_count()
    from efficient_attention_tpu.training.checkpoint import (
        parse_layers_to_keep,
    )

    keep = parse_layers_to_keep(
        getattr(args, "decoder_layers_to_keep", None))
    return TransformerLM(
        vocab_size=vocab_size,
        embed_dim=args.decoder_embed_dim,
        ffn_dim=args.decoder_ffn_embed_dim,
        num_layers=len(keep) if keep else args.decoder_layers,
        num_heads=args.decoder_attention_heads,
        attn_name=args.attn_name_decoder,
        attn_args=attn_args,
        dropout=args.dropout,
        max_len=args.max_len,
        adaptive_cutoffs=cutoffs,
        adaptive_input=bool(getattr(args, "adaptive_input", False)
                            and cutoffs),
        tie_adaptive=bool(getattr(args, "tie_adaptive_weights", False)),
        final_norm=not getattr(args, "no_decoder_final_norm", False),
        seq_axis=seq_axis,
        base_layers=getattr(args, "base_layers", 0),
        base_experts=base_experts,
        base_sublayers=getattr(args, "base_sublayers", 1),
        base_shuffle=getattr(args, "base_shuffle", False),
        checkpoint_activations=getattr(args, "checkpoint_activations", False),
        layerdrop=getattr(args, "decoder_layerdrop", 0.0),
        quant_noise_pq=getattr(args, "quant_noise_pq", 0.0),
        quant_noise_pq_block_size=getattr(
            args, "quant_noise_pq_block_size", 8),
        activation_fn=getattr(args, "activation_fn", "relu"),
        learned_pos=getattr(args, "decoder_learned_pos", False),
        dense_tokens=dense_tokens,
    )




def _pipelined_main(args, tokens, vocab_size, blocks, schedule) -> dict:
    """GPipe pipeline-parallel training loop (``--pipeline-stages N``) —
    the CLI surface for the reference's ``--pipeline-model-parallel``
    (``fairseq/dataclass/configs.py:365-423``), built on
    ``parallel.pipeline.make_pipelined_train_step``.

    The parameters ARE the TransformerLM flax params, restructured: decoder
    layer subtrees stacked on a leading L axis sharded over a ``stage``
    mesh axis; the (tied) token embedding and final LayerNorm replicated.
    Checkpoints are saved back in the TransformerLM layout, so eval_lm /
    generate consume pipelined checkpoints directly.  Dropout and the
    causal-EVA proposal noise run exactly as in the unpipelined trainer
    (rng folded per stage/tick/layer); the criterion is token-mean CE with
    a STREAMED vocab softmax (no ``[mb, T, V]`` materialization).  The
    adaptive tied softmax is not pipelined — request ``--criterion
    cross_entropy`` explicitly for large-vocab pipeline runs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from efficient_attention_tpu.models.adaptive_softmax import (
        _chunked_lse_and_target,
    )
    from efficient_attention_tpu.models.transformer import (
        DecoderLayer,
        sinusoidal_positions,
    )
    from efficient_attention_tpu.parallel.pipeline import (
        make_pipelined_train_step,
    )
    from efficient_attention_tpu.training import (
        CheckpointManager,
        MetricLogger,
        make_optimizer,
    )
    from efficient_attention_tpu.config import namespace_to_dict

    model = build_model(args, vocab_size, dense_tokens=True)
    if model.adaptive_cutoffs or model.adaptive_input:
        raise NotImplementedError(
            "--pipeline-stages does not pipeline the adaptive input/softmax "
            "stack; pass --criterion cross_entropy (the streamed-vocab CE "
            "head avoids the dense [*, V] logits) or drop --adaptive-input")
    n_stages = args.pipeline_stages
    devices = jax.devices()
    if len(devices) % n_stages != 0 and len(devices) < n_stages:
        raise ValueError(
            f"--pipeline-stages {n_stages} needs at least that many devices")
    L = args.decoder_layers
    if L % n_stages != 0:
        raise ValueError("--decoder-layers must divide by --pipeline-stages")
    D = args.decoder_embed_dim
    T = args.tokens_per_sample
    attn_args = namespace_to_dict(
        getattr(args, "attn_args_decoder", argparse.Namespace()))
    layer = DecoderLayer(
        embed_dim=D, ffn_dim=args.decoder_ffn_embed_dim,
        num_heads=args.decoder_attention_heads,
        attn_name=args.attn_name_decoder, attn_args=attn_args,
        dropout=args.dropout, has_cross=False, normalize_before=True)

    # init the REAL model once and restructure its params for the pipeline
    dummy = jnp.zeros((1, T), jnp.int32)
    full = jax.jit(lambda: model.init(jax.random.PRNGKey(args.seed), dummy))()
    dec = dict(full["params"]["decoder"])
    has_final_ln = "final_ln" in dec

    def _stack_from(dec_tree):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[dec_tree[f"layer_{i}"] for i in range(L)])

    def _to_flax(params3):
        stacked, emb_p, head_p = params3
        d = {f"layer_{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
             for i in range(L)}
        d["embed_tokens"] = {"embedding": emb_p}
        if has_final_ln:
            d["final_ln"] = {"scale": head_p["scale"],
                             "bias": head_p["bias"]}
        return {"params": {"decoder": d}}

    stacked = _stack_from(dec)
    emb = dec["embed_tokens"]["embedding"]
    head_p = ({"scale": dec["final_ln"]["scale"],
               "bias": dec["final_ln"]["bias"]} if has_final_ln else {})
    pos = jnp.asarray(sinusoidal_positions(T, D))
    scale = math.sqrt(D)

    def embed_fn(p, tok, rng):
        h = jnp.take(p, tok, axis=0) * scale + pos[None, None]
        if args.dropout > 0.0:
            keep = jax.random.bernoulli(rng, 1.0 - args.dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - args.dropout), 0.0)
        return h

    def head_fn(p, emb_p, h):
        if has_final_ln:
            mu = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
            h = (h - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
        # tied output projection (share_input_output_embed): stream the
        # vocab — the loss consumes (features, weight) without ever
        # building [*, V] logits
        return h, emb_p

    def layer_fn(p, x, rng):
        return layer.apply(
            {"params": p}, x, deterministic=False,
            rngs={"dropout": rng, "sample": jax.random.fold_in(rng, 1)})

    def loss_fn(out, tgt):
        h, w = out
        lse, tgt_logit = _chunked_lse_and_target(h, w, tgt)
        mask = (tgt != 1).astype(jnp.float32)
        return jnp.sum((lse - tgt_logit) * mask) / jnp.maximum(
            jnp.sum(mask), 1.0)

    tx = make_optimizer(args.optimizer, schedule, weight_decay=0.0,
                        clip_grad=args.clip_norm)
    mesh = Mesh(np.array(devices[:n_stages]), ("stage",))
    init_opt, step = make_pipelined_train_step(
        layer_fn, loss_fn, tx, mesh, embed_fn=embed_fn, head_fn=head_fn,
        head_takes_embed=True)
    params3 = (stacked, emb, head_p)
    opt_state = init_opt(params3)

    os.makedirs(args.save_dir, exist_ok=True)
    manager = CheckpointManager(os.path.join(args.save_dir, "ckpt"),
                                save_interval_steps=1)
    start = 0
    latest = manager.latest_step()
    if latest is not None:
        restored = manager.restore(
            {"step": 0, "params": _to_flax(params3), "opt_state": opt_state})
        start = int(restored["step"])
        rdec = restored["params"]["params"]["decoder"]
        stacked = _stack_from(rdec)
        emb = rdec["embed_tokens"]["embedding"]
        if has_final_ln:
            head_p = {"scale": rdec["final_ln"]["scale"],
                      "bias": rdec["final_ln"]["bias"]}
        params3 = (stacked, emb, head_p)
        opt_state = restored["opt_state"]
        print(f"| resumed pipelined run at step {start}")

    base_rng = jax.random.PRNGKey(args.seed + 13)
    num_micro = max(2, args.pipeline_chunks)
    mb = max(1, args.max_tokens // T // num_micro)
    logger = MetricLogger()
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(blocks))
    pos_i = 0
    stats = {}

    def _save(update):
        manager.save(update, {"step": update, "params": _to_flax(params3),
                              "opt_state": opt_state})

    for update in range(start, args.max_update):
        if pos_i + num_micro * mb > len(order):
            order = rng.permutation(len(blocks))
            pos_i = 0
        idx = order[pos_i: pos_i + num_micro * mb]
        pos_i += num_micro * mb
        batch = np.stack([blocks[int(i)] for i in idx])
        toks = jnp.asarray(batch[:, :-1]).reshape(num_micro, mb, T)
        tgts = jnp.asarray(batch[:, 1:]).reshape(num_micro, mb, T)
        params3, opt_state, loss = step(
            params3, opt_state, toks, tgts,
            jax.random.fold_in(base_rng, update))
        logger.update(loss=float(loss))
        if (update + 1) % args.log_interval == 0:
            print(f"| pp step {update + 1} {logger}")
        if (update + 1) % args.save_interval_updates == 0:
            _save(update + 1)
        stats = {"step": update + 1, "loss": float(loss)}
    if args.max_update > start:
        _save(args.max_update)
    manager.wait()
    print(json.dumps(stats))
    return stats

def main(args) -> dict:
    from efficient_attention_tpu.parallel import init_distributed_from_args

    init_distributed_from_args(args)  # no-op unless --distributed/env
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from efficient_attention_tpu.data.text_data import TokenBlockDataset
    from efficient_attention_tpu.parallel import batch_spec, make_mesh
    from efficient_attention_tpu.training import (
        CheckpointManager,
        MetricLogger,
        TrainState,
        cosine_tmult_schedule,
        inverse_sqrt_schedule,
        make_optimizer,
        polynomial_schedule,
    )
    from efficient_attention_tpu.training.lm_steps import make_lm_train_step

    tokens, dictionary, vocab_size = load_corpus(args)
    # dense_tokens: TokenBlock 'none' blocks only ever carry TRAILING pads
    # (tail block); causal attention already hides trailing keys from every
    # real query and pad targets are loss-masked, so the attention-level
    # mask is vacuous — and materializing it would disqualify the packed
    # causal-EVA kernel for the whole training run.
    model = build_model(args, vocab_size, dense_tokens=True)
    blocks = TokenBlockDataset(tokens, args.tokens_per_sample + 1, pad_idx=1)
    n_dev = len(jax.devices())
    sp = max(1, args.seq_parallel)
    mesh = make_mesh(data=-1, seq=sp)
    dp = max(1, n_dev // sp)
    # the batch must split into update_freq microbatches that each shard
    # evenly over the data axis
    quantum = dp * max(1, args.update_freq)
    batch_size = max(quantum, (args.max_tokens // args.tokens_per_sample)
                     * args.update_freq)
    batch_size -= batch_size % quantum

    if args.lr_scheduler == "cosine":
        schedule = cosine_tmult_schedule(
            args.lr, args.warmup_updates, int(args.lr_period_updates),
            t_mult=args.t_mult, min_lr=args.min_lr,
            warmup_init_lr=args.warmup_init_lr,
            lr_shrink=getattr(args, "lr_shrink", 1.0),
            max_steps=args.max_update)
    elif args.lr_scheduler == "inverse_sqrt":
        schedule = inverse_sqrt_schedule(args.lr, args.warmup_updates,
                                         args.warmup_init_lr)
    else:
        schedule = polynomial_schedule(args.lr, args.warmup_updates,
                                       args.max_update)

    if args.pipeline_stages > 1:
        return _pipelined_main(args, tokens, vocab_size, blocks, schedule)

    dummy = jnp.zeros((1, args.tokens_per_sample), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(args.seed), dummy))()
    tx = make_optimizer(args.optimizer, schedule, weight_decay=0.0,
                        clip_grad=args.clip_norm, params_for_mask=params)
    state = TrainState.create(
        model.apply, params, tx,
        ema_decay=args.ema_decay if args.store_ema else 0.0)

    repl = NamedSharding(mesh, P())
    if sp > 1:
        from efficient_attention_tpu.parallel.seq_parallel import (
            make_seq_parallel_lm_train_step,
        )

        sp_model = build_model(args, vocab_size, seq_axis="seq",
                               dense_tokens=True)
        jit_step = make_seq_parallel_lm_train_step(
            mesh, sp_model, pad_idx=1, accum_steps=args.update_freq,
            compute_dtype=jnp.bfloat16 if args.bf16 else None)
    else:
        train_step = make_lm_train_step(
            pad_idx=1, accum_steps=args.update_freq,
            use_adaptive=model.adaptive_cutoffs is not None,
            compute_dtype=jnp.bfloat16 if args.bf16 else None)
        data_sharding = NamedSharding(mesh, batch_spec())
        jit_step = jax.jit(
            train_step,
            in_shardings=(repl, data_sharding, data_sharding, None),
            out_shardings=(repl, None), donate_argnums=(0,))
    state = jax.device_put(state, repl)

    os.makedirs(args.save_dir, exist_ok=True)
    ckpt = CheckpointManager(os.path.join(args.save_dir, "ckpt"),
                             keep_last=args.keep_interval_updates,
                             save_interval_steps=args.save_interval_updates)
    logger = MetricLogger()
    rng = jax.random.PRNGKey(args.seed)
    n_blocks = len(blocks)
    order_rng = np.random.default_rng(args.seed)
    order = order_rng.permutation(n_blocks)
    pos = 0

    def _advance_order(order, pos):
        if pos + batch_size > n_blocks:
            order = order_rng.permutation(n_blocks)
            pos = 0
        return order, pos

    if getattr(args, "finetune_from_model", None):
        # params-only warm start (fairseq --finetune-from-model: the
        # optimizer, lr schedule, and dataloader all reset)
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
        # a full-depth warm-start checkpoint must be pruned to the
        # --decoder-layers-to-keep depth the model was built at
        # (fairseq prune_state_dict runs on every load, ADVICE r3)
        from efficient_attention_tpu.training.checkpoint import (
            maybe_prune_for_keep,
            parse_layers_to_keep,
        )

        fparams = maybe_prune_for_keep(
            fparams,
            parse_layers_to_keep(
                getattr(args, "decoder_layers_to_keep", None)),
            "decoder")
        fparams = jax.device_put(fparams, repl)
        state = state.replace(
            params=fparams,
            ema_params=(fparams if state.ema_params is not None else None))
        print(f"| finetuning from {args.finetune_from_model} "
              f"(step {int(fstep)}); optimizer and schedule reset")
    # auto-resume from the newest checkpoint (fairseq train.py:162 —
    # load_checkpoint restores trainer state AND the iterator position;
    # here the batch order is a deterministic function of (seed, step), so
    # the pointer is replayed instead of serialized)
    last = ckpt.latest_step()
    if last is not None and last > 0:
        state = ckpt.restore(state, step=last)
        state = jax.device_put(state, repl)
        for _ in range(last):
            order, pos = _advance_order(order, pos)
            pos += batch_size
        print(f"| resumed from checkpoint step {last}")

    tb = None
    if getattr(args, "tensorboard_logdir", ""):
        from efficient_attention_tpu.training.tensorboard import SummaryWriter

        tb = SummaryWriter(args.tensorboard_logdir)
    wb = None
    if getattr(args, "wandb_project", None):
        from efficient_attention_tpu.training.wandb_sink import WandBLogger

        wb = WandBLogger(args.wandb_project, run_name="train_lm",
                         config=vars(args), log_dir=args.save_dir)
    aml = None
    if getattr(args, "azureml_logging", False):
        from efficient_attention_tpu.training.azureml_sink import AzureMLLogger

        aml = AzureMLLogger(True, log_dir=args.save_dir)

    # ---- in-train validation (fairseq train.py validate_and_save):
    # valid-split loss/ppl every --validate-interval-updates and once at
    # the end of training ----
    valid_blocks = None
    if not args.disable_validation:
        try:
            vtokens, _, _ = load_corpus(args, split="valid")
            valid_blocks = TokenBlockDataset(
                vtokens, args.tokens_per_sample + 1, pad_idx=1)
        except FileNotFoundError:
            print("| no valid split found; skipping in-train validation")
    jit_valid = None
    if valid_blocks is not None:
        from efficient_attention_tpu.training.lm_steps import (
            make_lm_eval_step,
        )

        _ev = make_lm_eval_step(
            use_adaptive=model.adaptive_cutoffs is not None, pad_idx=1)
        jit_valid = jax.jit(
            lambda p, t, g, m: _ev(p, model.apply, t, g, m))

    def validate(state) -> dict:
        if jit_valid is None:
            return {}
        nll_sum = tok_sum = 0.0
        vb = max(1, args.max_tokens // args.tokens_per_sample)
        n = (len(valid_blocks) // vb) * vb
        for i in range(0, n, vb):
            batch = np.stack([valid_blocks[j] for j in range(i, i + vb)])
            t_in = jnp.asarray(batch[:, :-1])
            t_tg = jnp.asarray(batch[:, 1:])
            ns, nt = jit_valid(state.params, t_in, t_tg,
                               jnp.ones_like(t_tg, bool))
            nll_sum += float(ns)
            tok_sum += float(nt)
        nll = nll_sum / max(tok_sum, 1.0)
        vm = {"valid_loss": nll, "valid_ppl": math.exp(min(nll, 50.0))}
        print(f"| valid loss {nll:.3f} ppl {vm['valid_ppl']:.2f}")
        return vm

    t0 = time.time()
    stats = {}
    consec_skips = 0
    best_valid, bad_valids = float("inf"), 0
    validated_at = -1
    from efficient_attention_tpu.utils.watchdog import maybe_paused

    watchdog = None
    if getattr(args, "heartbeat_timeout", -1) and args.heartbeat_timeout > 0:
        from efficient_attention_tpu.utils.watchdog import HeartbeatWatchdog

        watchdog = HeartbeatWatchdog(args.heartbeat_timeout)  # armed after step 1
        # (first-step XLA compilation must not count against the
        # timeout)
    if getattr(args, "profile", None):
        from efficient_attention_tpu.utils.profiling import start_profile

        _prof = start_profile(args.profile)
        print(f"| profiler trace -> {args.profile}")
    else:
        _prof = None
    while int(state.step) < args.max_update:
        order, pos = _advance_order(order, pos)
        idx = order[pos: pos + batch_size]
        pos += batch_size
        batch = np.stack([blocks[int(i)] for i in idx])
        toks = jnp.asarray(batch[:, :-1])
        tgts = jnp.asarray(batch[:, 1:])
        state, metrics = jit_step(state, toks, tgts, rng)
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
        step = int(state.step)  # blocks on the device step -> real progress
        if watchdog is not None:
            watchdog.start().beat()
        loss = float(metrics.loss)
        logger.update(loss=loss, ppl=math.exp(min(loss, 20)),
                      gnorm=float(metrics.grad_norm))
        if step % args.log_interval == 0:
            wps = step * batch_size * args.tokens_per_sample / (
                time.time() - t0)
            print(f"| step {step} {logger} | wps {wps:.0f}")
            scalars = {"loss": loss, "ppl": math.exp(min(loss, 20)),
                       "gnorm": float(metrics.grad_norm), "wps": wps}
            if tb is not None:
                tb.add_scalars(scalars, step=step)
            if wb is not None:
                wb.log(scalars, step=step)
            if aml is not None:
                aml.log(scalars, step=step)
        if not args.no_save:
            with maybe_paused(watchdog):
                ckpt.save(step, state)
        stats = {"step": step, "loss": loss,
                 "ppl": math.exp(min(loss, 20))}
        if (args.stop_time_hours > 0
                and time.time() - t0 > args.stop_time_hours * 3600):
            print(f"| stopping: --stop-time-hours {args.stop_time_hours} "
                  "reached")
            break
        if (args.validate_interval_updates > 0
                and step % args.validate_interval_updates == 0):
            # the watchdog only times training steps (fairseq's
            # DistributedTimeoutWrapper wraps the module forward only) —
            # a validation pass longer than --heartbeat-timeout must not
            # kill a healthy rank (ADVICE r3)
            with maybe_paused(watchdog):
                vm = validate(state)
            validated_at = step
            stats.update(vm)
            for sink in (tb, wb, aml):
                if sink is not None:
                    (sink.add_scalars if sink is tb else sink.log)(
                        vm, step=step)
            # fairseq --patience (checkpoint_utils should_stop_early):
            # stop after N consecutive validations without improvement
            if args.patience > 0 and "valid_loss" in vm:
                if vm["valid_loss"] < best_valid - 1e-9:
                    best_valid, bad_valids = vm["valid_loss"], 0
                else:
                    bad_valids += 1
                    if bad_valids >= args.patience:
                        print(f"| early stop: valid loss has not improved "
                              f"for {bad_valids} validations (--patience "
                              f"{args.patience})")
                        stats["early_stop"] = True
                        break
    if _prof is not None:
        _prof()
    if watchdog is not None:
        watchdog.stop()
    # final validation (fairseq validates before exiting) — skipped when
    # the loop already validated this exact step (e.g. a --patience stop)
    if validated_at != int(state.step):
        stats.update(validate(state))
    ckpt.wait()
    print(json.dumps(stats))
    return stats


def cli_main(argv=None):
    return main(parse_args(argv))


if __name__ == "__main__":
    cli_main()
