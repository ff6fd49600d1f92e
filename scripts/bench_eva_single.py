"""Bounded compile+timing probe for the single-pass EVA kernel
(``ops/pallas/eva_single.py``) at the bench geometry, vs the packed
two-kernel path.  The round-4 kernel check hung >20 min inside the single
kernel's first device compile — this probe brackets each stage with wall
clocks and flushes, so a hang is attributable.

Usage: python scripts/bench_eva_single.py [B] [dtype]
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

import time

import jax
import jax.numpy as jnp

from _bench_util import timeit_loop
from efficient_attention_tpu import AttentionFactory

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
dt = jnp.float32 if (len(sys.argv) > 2 and sys.argv[2] == "f32") \
    else jnp.bfloat16
BASE = {"dim": 192, "num_heads": 3, "window_size": 7, "num_landmarks": 49,
        "attn_2d": True, "use_rpe": True, "adaptive_proj": "default",
        "impl": "packed"}

x = jnp.ones((B, 28, 28, 192), dt)
for label, extra in [("packed", {}), ("single", {"use_single_kernel": True})]:
    m = AttentionFactory.build_attention("eva", dict(BASE, **extra))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                    deterministic=True))()
    params = jax.tree_util.tree_map(lambda p: p.astype(dt), params)

    def fwd(x, params):
        return m.apply(params, x, deterministic=True).astype(x.dtype)

    t0 = time.perf_counter()
    print(f"[{label}] compiling...", flush=True)
    f = jax.jit(lambda x, p: fwd(x, p).sum())
    float(f(x, params))
    print(f"[{label}] compile+first-run {time.perf_counter() - t0:.1f}s",
          flush=True)
    ms = timeit_loop(fwd, x, params, n1=5, n2=25)
    print(f"[{label}] {ms:7.3f} ms/layer", flush=True)
