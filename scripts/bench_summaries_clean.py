"""Clean-feedback timing: summary kernel vs XLA eval form.

The earlier probes fed the [B, N, 576] qkv back through the loop, adding a
hidden 115MB copy (~0.28 ms) to every variant.  Here the loop feeds back
through the SMALL rf output; qkv dependence is broken only via a zero-
scaled bias perturbation, so the kernel re-runs but nothing big is copied.
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import jax
import jax.numpy as jnp
from flax import linen as nn

from _bench_util import timeit_loop
from efficient_attention_tpu.attention import EVA
from efficient_attention_tpu.ops.pallas.eva_summaries import (
    eva_summaries_packed,
)

B, G, DIM, NH, J = 128, 28, 192, 3, 4

m = EVA(dim=DIM, num_heads=NH, window_size=7, num_landmarks=49,
        attn_2d=True, use_rpe=True, adaptive_proj="default", impl="xla")
x32 = jnp.ones((2, G, G, DIM), jnp.float32)
params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x32,
                                deterministic=True))()
params16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
qkv = jnp.ones((B, G * G, 3 * DIM), jnp.bfloat16)
pq = params16["params"]["adaptive_mu_q"]
pk = params16["params"]["adaptive_mu_k"]
rf0 = jnp.zeros((B, 49, DIM), jnp.bfloat16)


def kern(rf_prev):
    bq = pq["layers_0"]["bias"] + rf_prev[0, 0, :64] * 0
    rf, bt = eva_summaries_packed(
        qkv, pq["layers_0"]["kernel"], bq,
        pk["layers_0"]["kernel"], pk["layers_0"]["bias"],
        pq["layers_1"]["scale"], pq["layers_1"]["bias"],
        pk["layers_1"]["scale"], pk["layers_1"]["bias"],
        nh=NH, gw=G, j=J, use_ln=True)
    return (rf + bt).astype(rf_prev.dtype)


print(f"pallas summaries {timeit_loop(kern, rf0):7.3f} ms", flush=True)


def xla_form(rf_prev):
    p2 = jax.tree_util.tree_map(lambda a: a, params16)
    # perturb one bias through rf_prev to keep the loop body live
    p2["params"]["adaptive_mu_q"]["layers_0"]["bias"] = (
        pq["layers_0"]["bias"] + rf_prev[0, 0, :64] * 0)
    rf, bt = nn.apply(
        lambda mod, q: mod._chunk_summaries_packed(q, (G, G), J, True),
        m)(p2, qkv)
    return (rf + bt).astype(rf_prev.dtype)


print(f"xla summaries    {timeit_loop(xla_form, rf0):7.3f} ms", flush=True)
