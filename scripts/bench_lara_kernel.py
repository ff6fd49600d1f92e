"""Race the fused LARA SNIS kernel vs the XLA composition on chip.

VERDICT r5 item 4: "LARA/Performer: kernel or measured disposal" — the
north star names LARA's mis-opt/pool-mixed hot loop as a Pallas target.
This measures the whole swappable module (qkv/out projections included)
at the tracked ViT geometry (B=128, seq 784, dim 192, 3 heads, 49
landmarks, bf16, eval) for impl='fused' vs impl='xla', plus the exact
softmax comparator, using the shared slope timer.

Usage: python scripts/bench_lara_kernel.py [--grid 28] [--batch 128]
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

import argparse

import jax
import jax.numpy as jnp

from _bench_util import timeit_loop


def module_ms(impl: str, grid: int, batch: int) -> float:
    if impl == "softmax":
        from efficient_attention_tpu.attention.base import (
            MultiheadAttention,
        )

        m = MultiheadAttention(dim=192, num_heads=3)
    else:
        from efficient_attention_tpu.attention.lara import LinearRA

        m = LinearRA(dim=192, num_heads=3, num_landmarks=49,
                     proposal_gen="pool-mixed", mis_type="mis-opt",
                     impl=impl)
    x = jnp.ones((batch, grid, grid, 192), jnp.bfloat16)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16),
                                    params)

    def fwd(x, p):
        return m.apply(p, x, deterministic=True).astype(x.dtype)

    return timeit_loop(fwd, x, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=28)
    ap.add_argument("--batch", type=int, default=128)
    a = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for impl in ("xla", "fused", "softmax"):
        ms = module_ms(impl, a.grid, a.batch)
        print(f"lara[{impl:8s}] grid={a.grid} B={a.batch}: "
              f"{ms:7.3f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
