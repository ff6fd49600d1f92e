"""Fwd+bwd timing of the 2-D packed EVA module at the ViT bench geometry.

Measures jax.grad through the whole EVA module (DeiT-tiny-p8 shape:
[128, 28, 28, 192], window 7, 49 landmarks) for impl='packed' vs the XLA
window path, to quantify the batch-parallel backward fix (dbias emitted as
per-batch-group partials so the batch grid axis stays 'parallel'; see
ops/pallas/eva_packed.py::_bwd_fused).
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E501,E702

import jax
import jax.numpy as jnp

from _bench_util import timeit_loop
from efficient_attention_tpu import AttentionFactory

B, GRID, DIM, NH = 128, 28, 192, 3


def run(impl):
    args = {"dim": DIM, "num_heads": NH, "window_size": 7,
            "num_landmarks": 49, "attn_2d": True, "use_rpe": True,
            "adaptive_proj": "default", "impl": impl}
    m = AttentionFactory.build_attention("eva", args)
    x = jnp.ones((B, GRID, GRID, DIM), jnp.bfloat16)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    def loss(x, params):
        return jnp.sum(m.apply(params, x, deterministic=True)
                       .astype(jnp.float32))

    gfn = jax.grad(loss)

    def step(x, params):
        return x + gfn(x, params).astype(x.dtype) * 0

    ms = timeit_loop(step, x, params)
    print(f"{impl:10s} fwd+bwd {ms:7.3f} ms", flush=True)
    return ms


def main():
    p = run("packed")
    x = run("xla")
    print(f"packed fwd+bwd {p:.3f} ms vs xla {x:.3f} ms "
          f"({x / p:.2f}x)")


if __name__ == "__main__":
    main()
