"""Decompose DeiT-tiny-p8 forward time: floor vs attention modules.

Slope-timed (fixed ~30ms tunnel round-trip cancelled). Measures:
  - full model fwd: softmax, eva (auto), eva (xla)
  - single attention module apply at [128, 28, 28, 192]: softmax, eva, and
    eva sub-stages
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import functools

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timeit_loop
from efficient_attention_tpu.models import create_model
from efficient_attention_tpu import AttentionFactory

B = 128
EVA_ARGS = {"window_size": 7, "num_landmarks": 49, "attn_2d": True,
            "use_rpe": True, "adaptive_proj": "default"}


def model_fwd_ms(attn_name, attn_args):
    model = create_model("evit_tiny_p8", attn_name=attn_name,
                         attn_args=attn_args, img_size=224, num_classes=1000)
    x = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                        deterministic=True))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    def fwd(x, params):
        out = model.apply(params, x, deterministic=True)
        # output [B, 1000] -> broadcast back to x's shape class: pad to keep
        # feedback shape identical: just return x + mean (cheap dependency)
        return x + out.mean().astype(x.dtype)

    return timeit_loop(fwd, x, params, n1=3, n2=13)


def module_fwd_ms(attn_name, attn_args):
    m = AttentionFactory.build_attention(
        attn_name, dict(attn_args, dim=192, num_heads=3))
    x = jnp.ones((B, 28, 28, 192), jnp.bfloat16)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    def fwd(x, params):
        return m.apply(params, x, deterministic=True).astype(x.dtype)

    return timeit_loop(fwd, x, params, n1=5, n2=25)


def main():
    for name, args in (
        ("softmax", {}),
        ("eva-auto", EVA_ARGS),
        ("eva-xla", dict(EVA_ARGS, impl="xla")),
    ):
        attn = "eva" if name.startswith("eva") else name
        ms = model_fwd_ms(attn, args)
        print(f"model  {name:10s} {ms:8.3f} ms/fwd", flush=True)

    for name, args in (
        ("softmax", {}),
        ("eva-auto", EVA_ARGS),
        ("eva-xla", dict(EVA_ARGS, impl="xla")),
    ):
        attn = "eva" if name.startswith("eva") else name
        ms = module_fwd_ms(attn, args)
        print(f"module {name:10s} {ms:8.3f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
