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
    p.add_argument("--arch", default="transformer_wmt_en_de")
    p.add_argument("--attn-name-encoder", default="softmax")
    p.add_argument("--attn-name-decoder", default="softmax",
                   choices=["softmax", "causal_eva"])
    p.add_argument("--encoder-embed-dim", type=int, default=512)
    p.add_argument("--encoder-ffn-embed-dim", type=int, default=2048)
    p.add_argument("--encoder-layers", type=int, default=6)
    p.add_argument("--encoder-attention-heads", type=int, default=8)
    p.add_argument("--share-all-embeddings", action="store_true",
                   help="one embedding table for encoder/decoder/output "
                        "(the WMT recipe, reference main.sh:147; requires "
                        "a joint vocabulary)")
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--max-tokens", type=int, default=4096)
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
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--max-nonfinite-skips", type=int, default=8,
                   help="abort after this many CONSECUTIVE skipped updates "
                        "(non-finite loss/grad -> skip + continue, the bf16 "
                        "analogue of fairseq trainer.py:911-920)")
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
    return apply_yaml_config(args, parser, argv)


def load_pairs(args):
    """Returns (src_dataset, tgt_dataset, src_dict, tgt_dict)."""
    if args.dummy_data or not args.data:
        rng = np.random.default_rng(args.seed)

        class _Dummy:
            def __init__(self, n=512, vmax=args.dummy_vocab):
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
    src = MMapIndexedDataset(os.path.join(args.data, f"train.{args.source_lang}"))
    tgt = MMapIndexedDataset(os.path.join(args.data, f"train.{args.target_lang}"))
    return src, tgt, sd, td


def build_model(args, src_vocab, tgt_vocab):
    import argparse as _ap

    from efficient_attention_tpu.config import namespace_to_dict
    from efficient_attention_tpu.models.transformer import TransformerModel

    return TransformerModel(
        src_vocab_size=src_vocab, tgt_vocab_size=tgt_vocab,
        embed_dim=args.encoder_embed_dim,
        ffn_dim=args.encoder_ffn_embed_dim,
        num_layers=args.encoder_layers,
        num_heads=args.encoder_attention_heads,
        attn_name_encoder=args.attn_name_encoder,
        attn_args_encoder=namespace_to_dict(
            getattr(args, "attn_args_encoder", _ap.Namespace())),
        attn_name_decoder=args.attn_name_decoder,
        attn_args_decoder=namespace_to_dict(
            getattr(args, "attn_args_decoder", _ap.Namespace())),
        dropout=args.dropout, max_len=args.max_len,
        share_all_embeddings=getattr(args, "share_all_embeddings", False))


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
    from efficient_attention_tpu.training.lm_steps import make_mt_train_step

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
    state = TrainState.create(model.apply, params, tx)
    train_step = make_mt_train_step(
        pad_idx=1, label_smoothing=args.label_smoothing,
        accum_steps=args.update_freq)
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
    consec_skips = 0
    while int(state.step) < args.max_update:
        order = order_rng.permutation(len(pairs))
        order = order[np.argsort(sizes[order], kind="stable")]
        # each batch must split into update_freq microbatches that each
        # shard evenly over the devices
        quantum = n_dev * max(1, args.update_freq)
        batches = batch_by_size(order, sizes, args.max_tokens,
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
            ckpt.save(step, state)
            stats = {"step": step, "loss": loss}
    ckpt.wait()
    print(json.dumps(stats))
    return stats


def cli_main(argv=None):
    return main(parse_args(argv))


if __name__ == "__main__":
    cli_main()
