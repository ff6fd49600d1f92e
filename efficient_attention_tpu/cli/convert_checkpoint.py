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


def build_parser(attn_name: str = "eva"):
    from efficient_attention_tpu import AttentionFactory

    p = argparse.ArgumentParser(
        description="Reference checkpoint -> flax params", add_help=False)
    p.add_argument("--torch-ckpt", required=True,
                   help="reference ckpt.pth (or bare state_dict .pth)")
    p.add_argument("--model", default="evit_tiny_p16")
    p.add_argument("--attn-name", default="eva")
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--out", required=True, help="output .msgpack path")
    p = AttentionFactory.add_attn_specific_args(
        p, attn_name, struct_name="attn_specific_args", prefix="attn")
    p.add_argument("--help", action="help")
    return p


def parse_args(argv=None):
    from efficient_attention_tpu.config import NestedNamespace

    # two-pass: learn the attention class, then register its typed flags
    # (same mechanism as cli/train_vit.py:104-112)
    pre, _ = build_parser().parse_known_args(argv)
    return build_parser(pre.attn_name).parse_args(
        argv, namespace=NestedNamespace())


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
    model = create_model(args.model, attn_name=args.attn_name,
                         attn_args=attn_args, img_size=args.input_size,
                         num_classes=args.num_classes)
    x = jnp.zeros((1, args.input_size, args.input_size, 3))
    template = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, deterministic=True))()
    params = load_reference_checkpoint(args.torch_ckpt, template)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(params))
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"wrote {args.out}: {n:,} params ({args.model}/{args.attn_name})")
    return args.out


if __name__ == "__main__":
    main()
