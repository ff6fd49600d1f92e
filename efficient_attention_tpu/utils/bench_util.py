"""Shared microbenchmark harness for the tunneled (axon) TPU.

There is a fixed ~30ms host<->device round-trip per jit-call+fetch on this
tunnel (independent of iteration count), so kernel-level timings use the
SLOPE method: run the op n1 and n2 times inside one jit (unrolled — scan
adds nothing here), take best-of-windows for each, and report
(T(n2) - T(n1)) / (n2 - n1).  The fixed cost cancels exactly.

The op's output is fed back as its first input (same shape) so XLA cannot
hoist or CSE the repeated body.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _make_loop(fn, iters):
    @jax.jit
    def loop(first, *a):
        def body(c, _):
            return fn(c, *a).astype(first.dtype), ()

        c, _ = jax.lax.scan(body, first, None, length=iters)
        return c.astype(jnp.float32).sum()

    return loop


def timeit_loop(fn, first, *args, n1: int = 10, n2: int = 60,
                windows: int = 3) -> float:
    """ms per fn-call; fn(first, *args) must return an array of first.shape."""
    times = {}
    for iters in (n1, n2):
        loop = _make_loop(fn, iters)
        acc = loop(first, *args)
        acc = acc + loop(first, *args)
        float(acc)  # compile + warm (block_until_ready is a no-op here)
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            float(loop(first, *args))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    return (times[n2] - times[n1]) / (n2 - n1) * 1e3
