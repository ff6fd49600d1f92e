"""Convert a reference PyTorch ViT checkpoint into flax params.

Bridges the reference's training artifacts (``vit/main.py:355-363``
``ckpt.pth`` files, including the authors' published DeiT/PVT checkpoints)
into this framework: the converted params are written as a flax msgpack
file that user code loads via ``flax.serialization.from_bytes`` for eval
or fine-tuning.

Attention args use the same typed two-pass registration as the train CLIs
(``AttentionFactory.add_attn_specific_args``), so the flags and their
validation match ``train_vit.py`` exactly:

  python -m efficient_attention_tpu.cli.convert_checkpoint \
      --torch-ckpt ckpt.pth --model evit_tiny_p16 --attn-name eva \
      --attn-window-size 7 --attn-num-landmarks 49 --attn-attn-2d \
      --attn-use-rpe --out params.msgpack
"""
from __future__ import annotations

import argparse


def build_parser(attn_name: str = "eva", enc_attn_name: str = None):
    from efficient_attention_tpu import AttentionFactory

    p = argparse.ArgumentParser(
        description="Reference checkpoint -> flax params", add_help=False)
    p.add_argument("--torch-ckpt", required=True,
                   help="reference ckpt.pth (or bare state_dict .pth)")
    p.add_argument("--family", default="vit", choices=("vit", "lm", "mt"),
                   help="checkpoint family: vit (DeiT/PVT), lm "
                        "(transformer_lm_wiki103), mt (transformer_wmt_en_de)")
    p.add_argument("--model", default="evit_tiny_p16")
    p.add_argument("--attn-name", default="eva")
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--out", required=True, help="output .msgpack path")
    # LM/MT family shape flags; defaults follow the published recipe for
    # the chosen family (transformer_lm_wiki103 = 16L/1024/4096/8h;
    # transformer_wmt_en_de = 6L/512/2048/8h)
    p.add_argument("--lm-embed-dim", type=int, default=None)
    p.add_argument("--lm-ffn-dim", type=int, default=None)
    p.add_argument("--lm-layers", type=int, default=None)
    p.add_argument("--lm-heads", type=int, default=None)
    p.add_argument("--attn-name-encoder", default=None,
                   help="MT family: encoder attention name")
    p = AttentionFactory.add_attn_specific_args(
        p, attn_name, struct_name="attn_specific_args", prefix="attn")
    if enc_attn_name:
        p = AttentionFactory.add_attn_specific_args(
            p, enc_attn_name, struct_name="attn_args_encoder",
            prefix="encoder-attn")
    p.add_argument("--help", action="help")
    return p


def parse_args(argv=None):
    from efficient_attention_tpu.config import NestedNamespace

    # two-pass: learn the attention class, then register its typed flags
    # (same mechanism as cli/train_vit.py:104-112)
    pre, _ = build_parser().parse_known_args(argv)
    return build_parser(pre.attn_name, pre.attn_name_encoder).parse_args(
        argv, namespace=NestedNamespace())


def _load_torch_sd(path):
    import numpy as np
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _lang_template_and_convert(args, attn_args):
    """LM/MT families: build the flax model matching the published recipe
    shape and convert the fairseq state dict onto it."""
    import jax
    import jax.numpy as jnp

    from efficient_attention_tpu.interop import convert_lang_state_dict

    # recipe-shape defaults per family (override with the --lm-* flags)
    lm_shape = args.family == "lm"
    embed_dim = args.lm_embed_dim or (1024 if lm_shape else 512)
    ffn_dim = args.lm_ffn_dim or (4096 if lm_shape else 2048)
    n_layers = args.lm_layers or (16 if lm_shape else 6)
    n_heads = args.lm_heads or 8

    sd = _load_torch_sd(args.torch_ckpt)
    if args.family == "lm":
        from efficient_attention_tpu.models.transformer import TransformerLM

        vocab = sd["decoder.embed_tokens.embeddings.0.0.weight"].shape[0]
        n_band = sum(1 for k in sd
                     if k.endswith(".0.weight")
                     and k.startswith("decoder.embed_tokens.embeddings"))
        cut = [vocab]
        for i in range(1, n_band):
            cut.append(cut[-1]
                       + sd[f"decoder.embed_tokens.embeddings.{i}.0.weight"
                            ].shape[0])
        model = TransformerLM(
            vocab_size=cut[-1], embed_dim=embed_dim,
            ffn_dim=ffn_dim, num_layers=n_layers,
            num_heads=n_heads, attn_name=args.attn_name,
            attn_args=attn_args, dropout=0.0,
            adaptive_cutoffs=tuple(cut[:-1]), adaptive_input=True,
            tie_adaptive=True, final_norm=False)
        toks = jnp.zeros((1, 8), jnp.int32)
        template = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), toks))()
        return convert_lang_state_dict(sd, template)
    from efficient_attention_tpu.models.transformer import TransformerModel

    vocab = sd["encoder.embed_tokens.weight"].shape[0]
    model = TransformerModel(
        src_vocab_size=vocab, tgt_vocab_size=vocab,
        embed_dim=embed_dim, ffn_dim=ffn_dim,
        num_layers=n_layers, num_heads=n_heads,
        attn_name_encoder=args.attn_name_encoder or "softmax",
        attn_args_encoder=namespace_to_dict_safe(args, "attn_args_encoder"),
        attn_name_decoder=args.attn_name, attn_args_decoder=attn_args,
        dropout=0.0, share_all_embeddings=True)
    toks = jnp.zeros((1, 8), jnp.int32)
    template = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), toks, toks))()
    return convert_lang_state_dict(sd, template, shared_embed=True)


def namespace_to_dict_safe(args, name):
    from efficient_attention_tpu.config import namespace_to_dict

    return namespace_to_dict(getattr(args, name, argparse.Namespace()))


def main(argv=None) -> str:
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from efficient_attention_tpu.config import namespace_to_dict
    from efficient_attention_tpu.interop import load_reference_checkpoint
    from efficient_attention_tpu.models import create_model

    attn_args = namespace_to_dict(
        getattr(args, "attn_specific_args", argparse.Namespace()))
    if args.family in ("lm", "mt"):
        params = _lang_template_and_convert(args, attn_args)
    else:
        model = create_model(args.model, attn_name=args.attn_name,
                             attn_args=attn_args, img_size=args.input_size,
                             num_classes=args.num_classes)
        x = jnp.zeros((1, args.input_size, args.input_size, 3))
        template = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), x,
                               deterministic=True))()
        params = load_reference_checkpoint(args.torch_ckpt, template)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(params))
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"wrote {args.out}: {n:,} params ({args.model}/{args.attn_name})")
    return args.out


if __name__ == "__main__":
    main()
