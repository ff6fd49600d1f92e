"""Profiling and throughput instrumentation.

Replaces the reference's profiling hooks: per-step
``torch.autograd.profiler.record_function`` (``fairseq_cli/train.py:300-303``),
``--profile`` nvtx wrapping (``train.py:523-525``) and the fvcore FLOPs /
profiler harness (``vit/debug.py``).  TPU equivalents: ``jax.profiler``
traces with named step scopes, XLA cost analysis for FLOPs, and a timed
throughput helper that forces execution with a device-side dependency chain
(``block_until_ready`` alone is unreliable over tunneled TPUs).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable in TensorBoard/Perfetto
    (``--profile`` equivalent)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def start_profile(logdir: str = "/tmp/jax-trace"):
    """Start a trace and return an idempotent ``stop()`` that is ALSO
    registered atexit — so aborts (non-finite kill, KeyboardInterrupt,
    sys.exit) still finalize the trace instead of leaking a truncated
    one.  The trainers' ``--profile`` flag uses this form."""
    import atexit

    jax.profiler.start_trace(logdir)
    done = []

    def stop():
        if not done:
            done.append(True)
            jax.profiler.stop_trace()

    atexit.register(stop)
    return stop


@contextlib.contextmanager
def step_scope(name: str, step: int):
    """Named per-step annotation (``record_function('train_step-%d')``)."""
    with jax.profiler.StepTraceAnnotation(name, step_num=step):
        yield


def flop_count(fn: Callable, *args) -> Optional[float]:
    """Analytical FLOPs of a jitted function via XLA cost analysis
    (fvcore ``flop_count`` analogue, ``vit/debug.py:91-92``)."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def timed_throughput(fn: Callable, *args, iters: int = 30, warmup: int = 3,
                     items_per_call: int = 1) -> float:
    """items/sec over timed calls, forcing completion with a scalar
    dependency chain (``vit/utils.py:compute_throughput`` protocol)."""
    g = jax.jit(lambda *a: jnp.asarray(fn(*a)).sum())
    acc = g(*args)
    for _ in range(warmup):
        acc = acc + g(*args)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = acc + g(*args)
    float(acc)
    return items_per_call * iters / (time.perf_counter() - t0)
