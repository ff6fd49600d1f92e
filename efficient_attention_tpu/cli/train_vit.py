"""ViT training/eval CLI — the ``vit/main.py`` equivalent, TPU-native.

Reproduces the reference's CLI surface (two-pass parsing that injects the
chosen attention's flags into a nested namespace, ``vit/main.py:186-193``),
the DeiT recipe defaults (``vit/main.py:34-141``), and the training loop
semantics of ``vit/engine.py`` — with the runtime collapsed into one jitted
sharded train step (grads psum-averaged by XLA over the mesh).

Example (DeiT-tiny EVA, the README recipe ``README.md:104-124``):

  python -m efficient_attention_tpu.cli.train_vit \\
      --model evit_tiny_p16 --attn-name eva --batch-size 128 \\
      --attn-window-size 7 --attn-num-landmarks 49 --attn-attn-2d \\
      --attn-use-rpe --data-set SYNTHETIC --epochs 2
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "EfficientAttention-TPU ViT training", add_help=False)
    # mirrors vit/main.py:32-195
    parser.add_argument("--batch-size", default=64, type=int)
    parser.add_argument("--epochs", default=300, type=int)
    parser.add_argument("--model", default="evit_tiny_p16", type=str)
    parser.add_argument("--attn-name", default="softmax", type=str)
    parser.add_argument("--input-size", default=224, type=int)
    parser.add_argument("--drop", default=0.0, type=float)
    parser.add_argument("--drop-path", default=0.1, type=float)
    parser.add_argument("--attn-drop-rate", default=0.0, type=float)
    parser.add_argument("--model-ema", action="store_true", default=False)
    parser.add_argument("--model-ema-decay", default=0.99996, type=float)
    parser.add_argument("--sched", default="cosine", type=str,
                        choices=["cosine", "step"],
                        help="lr scheduler (timm --sched; DeiT recipes "
                             "use cosine)")
    parser.add_argument("--decay-epochs", default=30, type=float,
                        help="epochs between step-scheduler decays")
    parser.add_argument("--decay-rate", default=0.1, type=float)
    parser.add_argument("--cooldown-epochs", default=0, type=int,
                        help="extra epochs held at min-lr after the decay "
                             "ends (timm --cooldown-epochs)")
    parser.add_argument("--opt", default="adamw", type=str)
    parser.add_argument("--opt-eps", default=1e-8, type=float,
                        help="optimizer epsilon (timm --opt-eps)")
    parser.add_argument("--opt-betas", default=None, type=str,
                        help="optimizer betas, e.g. '0.9,0.999' "
                             "(timm --opt-betas)")
    parser.add_argument("--momentum", default=0.9, type=float,
                        help="sgd/nag momentum (timm --momentum)")
    parser.add_argument("--no-pos-emb", action="store_true", default=False,
                        help="drop the learned positional embedding "
                             "(reference vit/main.py --no-pos-emb)")
    parser.add_argument("--weight-decay", default=0.05, type=float)
    parser.add_argument("--lr", default=5e-4, type=float)
    parser.add_argument("--lr-ratio", default=1.0, type=float)
    parser.add_argument("--warmup-epochs", default=10, type=int)
    parser.add_argument("--warmup-lr", default=1e-6, type=float)
    parser.add_argument("--min-lr", default=1e-5, type=float)
    parser.add_argument("--clip-grad", default=None, type=float)
    parser.add_argument("--mixup", default=0.8, type=float)
    parser.add_argument("--cutmix", default=1.0, type=float)
    parser.add_argument("--mixup-prob", default=1.0, type=float)
    parser.add_argument("--mixup-switch-prob", default=0.5, type=float)
    parser.add_argument("--mixup-mode", default="batch", type=str,
                        choices=["batch", "pair", "elem"],
                        help="lambda pairing granularity (timm "
                             "--mixup-mode)")
    parser.add_argument("--cutmix-minmax", default=None, type=str,
                        help="cutmix box side range as 'lo,hi' fractions "
                             "(timm --cutmix-minmax; overrides the "
                             "sqrt(1-lam) box sampler)")
    parser.add_argument("--smoothing", default=0.1, type=float)
    # augmentation parity with vit/main.py:105-124
    parser.add_argument("--aa", default="rand-m9-mstd0.5-inc1", type=str,
                        help="auto-augment policy ('none' disables)")
    parser.add_argument("--color-jitter", default=0.4, type=float)
    parser.add_argument("--train-interpolation", default="bicubic", type=str)
    parser.add_argument("--reprob", default=0.25, type=float)
    parser.add_argument("--remode", default="pixel", type=str)
    parser.add_argument("--recount", default=1, type=int)
    parser.add_argument("--repeated-aug", action="store_true", default=False)
    parser.add_argument("--data-path", default=None, type=str)
    parser.add_argument("--data-set", default="SYNTHETIC", type=str,
                        choices=["IMAGENET", "CIFAR10", "CIFAR100",
                                 "SYNTHETIC"])
    parser.add_argument("--num-classes", default=1000, type=int)
    parser.add_argument("--output-dir", default="./checkpoints/vit")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--resume", default="", type=str)
    parser.add_argument("--init-params", default="", type=str,
                        help="warm-start params from a converted reference "
                             "checkpoint (convert_checkpoint msgpack)")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--checkpoint-activations", action="store_true",
                        help="rematerialize each block in the backward "
                             "(nn.remat) instead of storing activations")
    parser.add_argument("--throughput", action="store_true")
    parser.add_argument("--profile", nargs="?", const="/tmp/jax-trace",
                        default=None, metavar="LOGDIR",
                        help="capture a jax.profiler trace of training "
                             "(the reference wraps training in the torch "
                             "profiler under --profile)")
    parser.add_argument("--num-workers", default=8, type=int)
    parser.add_argument("--uint8-cache", default="", type=str,
                        help="path prefix of a pre-decoded uint8 image "
                             "cache (built on first use): removes JPEG "
                             "decode from the training path on decode-"
                             "bound hosts")
    parser.add_argument("--decode-backend", default="thread",
                        choices=["thread", "process"],
                        help="host decode workers: GIL-shared threads or a "
                             "spawn-context process pool (use 'process' "
                             "when real-JPEG decode can't feed the device "
                             "rate; see scripts/bench_input_pipeline.py)")
    parser.add_argument("--accum-steps", default=1, type=int)
    parser.add_argument("--max-steps-per-epoch", default=None, type=int,
                        help="truncate epochs (smoke tests)")
    parser.add_argument("--mesh-fsdp", default=1, type=int)
    parser.add_argument("--mesh-model", default=1, type=int)
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="mixed precision: f32 master params, bf16 "
                             "compute (the TPU form of the reference's "
                             "AMP/NativeScaler training, vit/main.py:295)")
    parser.add_argument("--tensorboard-logdir", default=None, type=str)
    parser.add_argument("--wandb-project", default=None, type=str)
    parser.add_argument("--azureml-logging", action="store_true")
    from efficient_attention_tpu.parallel import add_distributed_args
    add_distributed_args(parser)
    return parser


def parse_args(argv=None):
    """Two-pass parse: learn model/attn first, then register their flags
    (``vit/main.py:186-193``, ``README.md:37-60``)."""
    from efficient_attention_tpu import AttentionFactory, NestedNamespace
    from efficient_attention_tpu.models.efficient_vit import EfficientTransformer
    from efficient_attention_tpu.models.pvt import PyramidVisionTransformerV2

    from efficient_attention_tpu.config_yaml import (
        add_config_flag,
        apply_yaml_config,
        preparse_overrides,
    )

    parser = build_parser()
    add_config_flag(parser)
    names = preparse_overrides(parser, argv, ["model", "attn_name"])
    model_name, attn_name = names["model"], names["attn_name"]
    if model_name.startswith("pvt"):
        parser = PyramidVisionTransformerV2.add_model_specific_args(parser)
    else:
        parser = EfficientTransformer.add_model_specific_args(parser)
    parser = AttentionFactory.add_attn_specific_args(
        parser, attn_name, struct_name="attn_specific_args",
        prefix="attn")
    parser.add_argument("--help", action="help")
    args = parser.parse_args(argv, namespace=NestedNamespace())
    args.model, args.attn_name = model_name, attn_name
    return apply_yaml_config(args, parser, argv)


def build_dataset(args, train: bool):
    from efficient_attention_tpu.data.cifar import CIFARDataset
    from efficient_attention_tpu.data.imagenet import (
        ImageFolderDataset,
        SyntheticImageDataset,
    )
    from efficient_attention_tpu.data.randaugment import build_train_augment

    if args.data_set == "SYNTHETIC" or not args.data_path:
        return SyntheticImageDataset(
            num_samples=args.batch_size * 16 if train else args.batch_size * 4,
            img_size=args.input_size, num_classes=args.num_classes,
            train=train)
    aa = getattr(args, "aa", None)
    aa = None if (not aa or aa.lower() == "none") else aa
    augment = (build_train_augment(aa, getattr(args, "color_jitter", 0.0))
               if train else None)
    if args.data_set in ("CIFAR10", "CIFAR100"):
        return CIFARDataset(
            args.data_path, num_classes=10 if args.data_set == "CIFAR10"
            else 100, img_size=args.input_size, train=train, augment=augment)
    split = "train" if train else "val"
    cache = getattr(args, "uint8_cache", "")
    if cache:
        from efficient_attention_tpu.data.imagenet import CachedUint8Dataset

        path = f"{cache}.{split}"
        if not os.path.exists(path + ".imgs.npy"):
            print(f"| building uint8 cache {path} "
                  f"(one-time decode)", flush=True)
            CachedUint8Dataset.build(os.path.join(args.data_path, split),
                                     path, log_every=10000)
        return CachedUint8Dataset(path, img_size=args.input_size,
                                  train=train, augment=augment,
                                  interpolation=args.train_interpolation)
    return ImageFolderDataset(os.path.join(args.data_path, split),
                              img_size=args.input_size, train=train,
                              augment=augment,
                              interpolation=args.train_interpolation)


def main(args) -> dict:
    import jax

    from efficient_attention_tpu.parallel import (
        init_distributed_from_args,
        is_primary,
        put_batch,
    )

    init_distributed_from_args(args)  # no-op unless --distributed/env
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from efficient_attention_tpu.config import namespace_to_dict
    from efficient_attention_tpu.data.imagenet import (
        PrefetchLoader,
        ra_sampler_indices,
        shard_indices,
    )
    from efficient_attention_tpu.data.mixup import MixupConfig
    from efficient_attention_tpu.models import create_model
    from efficient_attention_tpu.parallel import batch_spec, infer_param_specs, make_mesh
    from efficient_attention_tpu.training import (
        CheckpointManager,
        MetricLogger,
        TrainState,
        cosine_schedule,
        make_optimizer,
        make_vit_eval_step,
        make_vit_train_step,
    )
    from efficient_attention_tpu.training.metrics import write_log_line

    n_dev = len(jax.devices())
    mesh = make_mesh(data=-1, fsdp=args.mesh_fsdp, model=args.mesh_model)
    attn_args = namespace_to_dict(getattr(args, "attn_specific_args",
                                          argparse.Namespace()))
    model_kwargs = dict(
        attn_name=args.attn_name, attn_args=attn_args,
        img_size=args.input_size, num_classes=args.num_classes,
        drop_rate=args.drop, drop_path_rate=args.drop_path,
        attn_drop_rate=args.attn_drop_rate,
        checkpoint_activations=getattr(args, "checkpoint_activations",
                                       False))
    if not args.model.startswith("pvt"):
        model_kwargs.update(
            patchify_stem=getattr(args, "patchify_stem", "default"),
            use_glu=getattr(args, "use_glu", False),
            use_pos_emb=not getattr(args, "no_pos_emb", False))
        if getattr(args, "depth", None):
            model_kwargs["depth"] = args.depth
        if getattr(args, "num_heads", None):
            model_kwargs["num_heads"] = args.num_heads
    else:
        model_kwargs.pop("drop_rate"), model_kwargs.pop("attn_drop_rate")
        model_kwargs.update(drop_rate=args.drop,
                            attn_drop_rate=args.attn_drop_rate)
    model = create_model(args.model, **model_kwargs)

    train_ds = build_dataset(args, train=True)
    val_ds = build_dataset(args, train=False)

    global_batch = args.batch_size * n_dev
    # linear lr scaling (``vit/main.py:292-293``)
    lr = args.lr * args.lr_ratio * global_batch / 512.0
    steps_per_epoch = max(1, len(train_ds) * (3 if args.repeated_aug else 1)
                          // global_batch)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    if args.sched == "step":
        from efficient_attention_tpu.training.optim import step_schedule

        schedule = step_schedule(
            lr, warmup_steps=args.warmup_epochs * steps_per_epoch,
            decay_steps=max(1, int(args.decay_epochs * steps_per_epoch)),
            decay_rate=args.decay_rate, warmup_init_lr=args.warmup_lr)
    else:
        # --cooldown-epochs: the cosine finishes early and the tail holds
        # at min-lr (timm semantics)
        decay_epochs = max(1, args.epochs - args.cooldown_epochs)
        schedule = cosine_schedule(
            lr, warmup_steps=args.warmup_epochs * steps_per_epoch,
            total_steps=decay_epochs * steps_per_epoch,
            warmup_init_lr=args.warmup_lr, min_lr=args.min_lr,
            steps_per_epoch=steps_per_epoch)

    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((1, args.input_size, args.input_size, 3), jnp.float32)
    params = jax.jit(lambda: model.init(rng, dummy, deterministic=True))()
    if getattr(args, "init_params", ""):
        # warm-start from converted reference params
        # (cli/convert_checkpoint.py msgpack output) for eval/fine-tuning
        from flax import serialization

        with open(args.init_params, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        print(f"| initialized params from {args.init_params}")
    betas = (tuple(float(b) for b in args.opt_betas.replace(" ", "")
                   .strip("()").split(","))
             if getattr(args, "opt_betas", None) else (0.9, 0.999))
    tx = make_optimizer(args.opt, schedule, weight_decay=args.weight_decay,
                        clip_grad=args.clip_grad, params_for_mask=params,
                        betas=betas, eps=getattr(args, "opt_eps", 1e-8),
                        momentum=getattr(args, "momentum", 0.9))
    state = TrainState.create(
        model.apply, params, tx,
        ema_decay=args.model_ema_decay if args.model_ema else 0.0)

    # shard: params replicated over data, sharded over fsdp/model by rule
    param_specs = infer_param_specs(
        params, use_fsdp=args.mesh_fsdp > 1, use_tp=args.mesh_model > 1)
    flat_params = jax.tree_util.tree_leaves(params)
    shapes_to_spec = {}
    for leaf, spec in zip(flat_params, jax.tree_util.tree_leaves(
            param_specs, is_leaf=lambda x: isinstance(x, P))):
        shapes_to_spec.setdefault(leaf.shape, spec)
    state_specs = TrainState(
        step=P(), params=param_specs,
        opt_state=jax.tree_util.tree_map(
            lambda l: shapes_to_spec.get(getattr(l, "shape", None), P()),
            state.opt_state),
        ema_params=param_specs if args.model_ema else None,
        apply_fn=state.apply_fn, tx=state.tx, ema_decay=state.ema_decay)
    to_shard = lambda spec: NamedSharding(mesh, spec)  # noqa: E731
    state_sharding = jax.tree_util.tree_map(
        to_shard, state_specs, is_leaf=lambda x: isinstance(x, P))
    state = jax.device_put(state, state_sharding)
    data_sharding = NamedSharding(mesh, batch_spec())

    mixup_cfg = None
    if args.mixup > 0 or args.cutmix > 0:
        minmax = None
        if getattr(args, "cutmix_minmax", None):
            minmax = tuple(float(v) for v in args.cutmix_minmax.split(","))
        mixup_cfg = MixupConfig(
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
            label_smoothing=args.smoothing, num_classes=args.num_classes,
            mode=getattr(args, "mixup_mode", "batch"),
            cutmix_minmax=minmax)
    erasing_cfg = None
    if getattr(args, "reprob", 0.0) > 0:
        from efficient_attention_tpu.data.erasing import ErasingConfig

        erasing_cfg = ErasingConfig(
            prob=args.reprob, mode=args.remode, count=args.recount)
    train_step = make_vit_train_step(
        mixup_cfg, num_classes=args.num_classes,
        label_smoothing=args.smoothing, accum_steps=args.accum_steps,
        erasing_cfg=erasing_cfg,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    jit_train = jax.jit(
        train_step,
        in_shardings=(state_sharding, data_sharding, data_sharding, None),
        out_shardings=(state_sharding, None), donate_argnums=(0,))
    eval_step = jax.jit(make_vit_eval_step(), static_argnums=(1,))

    os.makedirs(args.output_dir, exist_ok=True)
    ckpt = CheckpointManager(os.path.join(args.output_dir, "ckpt"),
                             keep_last=3)
    start_epoch = 0
    if args.resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_epoch = int(state.step) // steps_per_epoch
            print(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    if args.throughput:
        return compute_throughput(model, state.params, args)

    if args.eval:
        stats = evaluate(val_ds, state, eval_step, args, n_dev)
        print(json.dumps(stats))
        return stats

    log_path = os.path.join(args.output_dir, "log.txt")
    tb = None
    if args.tensorboard_logdir:
        from efficient_attention_tpu.training.tensorboard import SummaryWriter

        tb = SummaryWriter(args.tensorboard_logdir)
    from efficient_attention_tpu.training.wandb_sink import WandBLogger

    wb = WandBLogger(getattr(args, "wandb_project", None),
                     run_name=f"{args.model}-{args.attn_name}",
                     config=vars(args) if is_primary() else None,
                     log_dir=args.output_dir) if is_primary() else None
    aml = None
    if getattr(args, "azureml_logging", False) and is_primary():
        from efficient_attention_tpu.training.azureml_sink import AzureMLLogger

        aml = AzureMLLogger(True, log_dir=args.output_dir)
    step_rng = jax.random.PRNGKey(args.seed + 1)
    history = {}
    if getattr(args, "profile", None):
        from efficient_attention_tpu.utils.profiling import start_profile

        _prof = start_profile(args.profile)
        print(f"| profiler trace -> {args.profile}")
    else:
        _prof = None
    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        nproc, pid = jax.process_count(), jax.process_index()
        if args.repeated_aug:
            idx = ra_sampler_indices(len(train_ds), epoch, args.seed,
                                     num_replicas=nproc, rank=pid)
        else:
            idx = shard_indices(len(train_ds), epoch, args.seed,
                                num_replicas=nproc, rank=pid)
        loader = PrefetchLoader(train_ds, global_batch // nproc, idx,
                                num_threads=args.num_workers, seed=epoch,
                                backend=args.decode_backend)
        t0 = time.time()
        for i, (imgs, labels) in enumerate(
                logger.log_every(loader, 50, f"Epoch [{epoch}]")):
            if args.max_steps_per_epoch and i >= args.max_steps_per_epoch:
                break
            state, metrics = jit_train(
                state, put_batch(imgs, data_sharding),
                put_batch(labels, data_sharding), step_rng)
            logger.update(loss=float(metrics.loss),
                          grad_norm=float(metrics.grad_norm))
            if not math.isfinite(float(metrics.loss)):
                # reference aborts on non-finite loss (``vit/engine.py:53-55``)
                print("Loss is not finite, stopping training")
                sys.exit(1)
        val_stats = evaluate(val_ds, state, eval_step, args, n_dev)
        record = {"epoch": epoch, **logger.global_avg_dict(),
                  **{f"val_{k}": v for k, v in val_stats.items()},
                  "epoch_time": time.time() - t0}
        if is_primary():
            write_log_line(log_path, record)
        scalars = {k: v for k, v in record.items()
                   if isinstance(v, (int, float))}
        if tb is not None:
            tb.add_scalars(scalars, step=int(state.step))
        if wb is not None:
            wb.log(scalars, step=int(state.step))
        if aml is not None:
            aml.log(scalars, step=int(state.step))
        ckpt.save(int(state.step), state,
                  metrics={"acc1": val_stats.get("acc1", 0.0)})
        history = record
    if _prof is not None:
        _prof()
    ckpt.wait()
    return history


def evaluate(val_ds, state, eval_step, args, n_dev) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_attention_tpu.data.imagenet import PrefetchLoader, shard_indices

    # each process decodes/scores only its shard of the val set (the train
    # loader is sharded the same way); per-process sums are combined below
    nproc, pid = jax.process_count(), jax.process_index()
    idx = shard_indices(len(val_ds), 0, args.seed, num_replicas=nproc,
                        rank=pid, shuffle=False)
    loader = PrefetchLoader(val_ds, args.batch_size * n_dev, idx,
                            num_threads=args.num_workers, drop_last=True,
                            backend=getattr(args, "decode_backend",
                                            "thread"))
    agg = {"acc1": 0.0, "acc5": 0.0, "loss": 0.0}
    n = 0
    params = state.ema_params if state.ema_params is not None else state.params
    for imgs, labels in loader:
        out = eval_step(params, state.apply_fn, jnp.asarray(imgs),
                        jnp.asarray(labels))
        for k in agg:
            agg[k] += float(out[k])
        n += 1
    if nproc > 1:
        from jax.experimental import multihost_utils

        totals = np.sum(multihost_utils.process_allgather(
            np.array([agg["acc1"], agg["acc5"], agg["loss"], float(n)])),
            axis=0)
        agg = dict(zip(("acc1", "acc5", "loss"), totals[:3]))
        n = int(totals[3])
    return {k: float(v) / max(n, 1) for k, v in agg.items()}


def compute_throughput(model, params, args) -> dict:
    """images/sec over 30 timed forwards (``vit/utils.py:249-273``)."""
    import jax
    import jax.numpy as jnp

    batch = 128
    x = jnp.ones((batch, args.input_size, args.input_size, 3), jnp.bfloat16)
    p = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, x: model.apply(p, x, deterministic=True).sum())
    acc = fwd(p, x)
    for _ in range(3):
        acc = acc + fwd(p, x)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(30):
        acc = acc + fwd(p, x)
    float(acc)
    ips = batch * 30 / (time.perf_counter() - t0)
    print(f"throughput: {ips:.1f} images/sec")
    return {"images_per_sec": ips}


def cli_main(argv=None):
    args = parse_args(argv)
    return main(args)


if __name__ == "__main__":
    cli_main()
