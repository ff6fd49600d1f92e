"""Race the causal-packed BACKWARD's row-block choice (VERDICT r4 item 3).

At the T=512 recipe shape the packed module forward beats softmax (0.91 vs
1.41 ms) but fwd+bwd loses (2.84 vs 2.17) — the backward kernel is the gap.
`causal_packed.BWD_BUDGET` caps the VMEM estimate that picks RB (batch rows
per grid step); this sweeps budgets that land RB in {16, 8, 4, 2} and times
`_bwd_fused` alone at both LM bench geometries, so the shipped budget is a
measured choice rather than a guess.

Usage: python scripts/bench_causal_bwd.py
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

import jax
import jax.numpy as jnp

from _bench_util import timeit_loop

from efficient_attention_tpu.ops.pallas import causal_packed as cp


def _row_bytes(w: int, c: int, hd: int, isz: int) -> int:
    return (3 * w * (w + max(c, 128)) * 4
            + 2 * c * hd * (isz + 4)
            + 7 * w * hd * isz)


def bwd_ms(B, T, D, H, W, CS, budget, dtype=jnp.bfloat16):
    cp.BWD_BUDGET = budget
    cp._bwd_fused.clear_cache()
    # the custom-vjp closures cache compiled backwards too — without this a
    # module-level fwd+bwd compiled earlier in-process would keep its old RB
    cp._make_differentiable.cache_clear()
    C = T // CS
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    q, k, v, g = (0.1 * jax.random.normal(kk, (B, T, D), dtype)
                  for kk in ks[:4])
    rf, beta = (0.1 * jax.random.normal(kk, (B, C, D), dtype)
                for kk in ks[4:6])
    bias = 0.1 * jax.random.normal(ks[6], (W, W), jnp.float32)
    scale = (D // H) ** -0.5

    def fn(g, q, k, v, rf, beta, bias):
        dq, dk, dv, drf, dbt, dbias = cp._bwd_fused(
            q, k, v, rf, beta, bias, g, scale, H, W, CS)
        return dq + dk + dv

    return timeit_loop(fn, g, q, k, v, rf, beta, bias, n1=3, n2=13)


def fwd_ms(B, T, D, H, W, CS, dtype=jnp.bfloat16):
    C = T // CS
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    q, k, v = (0.1 * jax.random.normal(kk, (B, T, D), dtype)
               for kk in ks[:3])
    rf, beta = (0.1 * jax.random.normal(kk, (B, C, D), dtype)
                for kk in ks[4:6])
    bias = 0.1 * jax.random.normal(ks[6], (W, W), jnp.float32)
    scale = (D // H) ** -0.5

    def fn(q, k, v, rf, beta, bias):
        return cp._fwd(q, k, v, rf, beta, bias, scale, H, W, CS)

    return timeit_loop(fn, q, k, v, rf, beta, bias, n1=3, n2=13)


def main():
    shipped_budget = cp.BWD_BUDGET
    for (B, T, D, H, W, CS) in [(16, 512, 1024, 8, 128, 8),
                                (4, 2048, 512, 8, 128, 8)]:
        C = T // CS
        rbytes = _row_bytes(W, C, D, 2)
        print(f"--- B={B} T={T} d={D} H={H} w={W} cs={CS} "
              f"(bwd row-bytes {rbytes/1e6:.2f} MB)", flush=True)
        print(f"fwd (reference point)          {fwd_ms(B, T, D, H, W, CS):8.3f} ms",
              flush=True)
        for rb in (16, 8, 4, 2):
            if B % rb:
                continue
            budget = rbytes * rb + rbytes // 2
            try:
                ms = bwd_ms(B, T, D, H, W, CS, budget)
                print(f"bwd RB={rb:<2d} (budget {budget/1e6:6.1f} MB) "
                      f"{ms:8.3f} ms", flush=True)
            except Exception as e:
                print(f"bwd RB={rb:<2d} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    # restore the shipped budget (and drop sweep-compiled closures) so any
    # further work in this process uses the production RB choice
    cp.BWD_BUDGET = shipped_budget
    cp._bwd_fused.clear_cache()
    cp._make_differentiable.cache_clear()


if __name__ == "__main__":
    main()
