"""Race the fused FAVOR+ kernel vs the XLA composition on chip.

VERDICT r5 item 4 second half: the north star names the Performer
"random-feature prime maps" as a Pallas target.  This measures the whole
swappable module (qkv/out projections included) at the tracked ViT
geometry (B=128, seq 784, dim 192, 3 heads, m=64 features, bf16, eval)
for impl='fused' vs impl='xla', plus the exact softmax comparator, and
checks on-chip f32 parity between the two impls.

Usage: python scripts/bench_performer_kernel.py [--grid 28] [--batch 128]
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timeit_loop


def build(impl: str):
    if impl == "softmax":
        from efficient_attention_tpu.attention.base import (
            MultiheadAttention,
        )

        return MultiheadAttention(dim=192, num_heads=3)
    from efficient_attention_tpu.attention.kernelized import (
        KernelizedAttention,
    )

    return KernelizedAttention(dim=192, num_heads=3, approx_attn_dim=64,
                               proj_method="favorp", impl=impl)


def module_ms(impl: str, grid: int, batch: int) -> float:
    m = build(impl)
    x = jnp.ones((batch, grid, grid, 192), jnp.bfloat16)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16),
                                    params)

    def fwd(x, p):
        return m.apply(p, x, deterministic=True).astype(x.dtype)

    return timeit_loop(fwd, x, params)


def parity(grid: int, batch: int) -> float:
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, grid, grid, 192), jnp.float32)
    m_xla, m_fus = build("xla"), build("fused")
    params = jax.jit(lambda: m_xla.init(jax.random.PRNGKey(0), x,
                                        deterministic=True))()
    ref = jax.jit(lambda p, x: m_xla.apply(p, x, deterministic=True))(
        params, x)
    out = jax.jit(lambda p, x: m_fus.apply(p, x, deterministic=True))(
        params, x)
    return float(jnp.max(jnp.abs(out - ref)) / np.maximum(
        1e-6, float(jnp.max(jnp.abs(ref)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=28)
    ap.add_argument("--batch", type=int, default=128)
    a = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    err = parity(a.grid, min(a.batch, 16))
    print(f"on-chip f32 rel-max parity (fused vs xla): {err:.2e}",
          flush=True)
    for impl in ("xla", "fused", "softmax"):
        ms = module_ms(impl, a.grid, a.batch)
        print(f"performer[{impl:8s}] grid={a.grid} B={a.batch}: "
              f"{ms:7.3f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
