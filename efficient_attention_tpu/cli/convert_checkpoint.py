"""Convert a reference PyTorch ViT checkpoint into flax params.

Bridges the reference's training artifacts (``vit/main.py:355-363``
``ckpt.pth`` files, including the authors' published DeiT/EVA checkpoints)
into this framework: the converted params are written as a flax msgpack
file that ``--init-params`` style consumers (or user code via
``flax.serialization.from_bytes``) can load for eval or fine-tuning.

Usage:
  python -m efficient_attention_tpu.cli.convert_checkpoint \
      --torch-ckpt ckpt.pth --model evit_tiny_p16 --attn-name eva \
      --attn-arg window_size=7 --attn-arg num_landmarks=49 \
      --attn-arg attn_2d=true --attn-arg use_rpe=true \
      --out params.msgpack
"""
from __future__ import annotations

import argparse


def _parse_attn_arg(kv: str):
    k, v = kv.split("=", 1)
    low = v.lower()
    if low in ("true", "false"):
        return k, low == "true"
    try:
        return k, int(v)
    except ValueError:
        pass
    try:
        return k, float(v)
    except ValueError:
        return k, v


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch-ckpt", required=True,
                   help="reference ckpt.pth (or bare state_dict .pth)")
    p.add_argument("--model", default="evit_tiny_p16")
    p.add_argument("--attn-name", default="eva")
    p.add_argument("--attn-arg", action="append", default=[],
                   metavar="K=V", help="attention arg (repeatable)")
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--out", required=True, help="output .msgpack path")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from efficient_attention_tpu.interop import load_reference_checkpoint
    from efficient_attention_tpu.models import create_model

    attn_args = dict(_parse_attn_arg(kv) for kv in args.attn_arg)
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
