"""On-chip parity + timing for the fused summary kernel (round 3)."""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import jax
import jax.numpy as jnp
import numpy as np
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

# f32 parity on chip — XLA reference at HIGHEST matmul precision (the
# module's Dense at default precision truncates to bf16 on the MXU, which
# the adaptive LN amplifies ~1e-2; the kernel computes exactly, so compare
# against exact)
qkv32 = jax.random.normal(jax.random.PRNGKey(1), (4, G * G, 3 * DIM))
with jax.default_matmul_precision("highest"):
    ref = jax.jit(lambda p, q: nn.apply(
        lambda mod, q: mod._chunk_summaries_packed(q, (G, G), J, True),
        m)(p, q))
    rf_r, bt_r = ref(params, qkv32)
pq = params["params"]["adaptive_mu_q"]
pk = params["params"]["adaptive_mu_k"]
rf, bt = eva_summaries_packed(
    qkv32, pq["layers_0"]["kernel"], pq["layers_0"]["bias"],
    pk["layers_0"]["kernel"], pk["layers_0"]["bias"],
    pq["layers_1"]["scale"], pq["layers_1"]["bias"],
    pk["layers_1"]["scale"], pk["layers_1"]["bias"],
    nh=NH, gw=G, j=J, use_ln=True)
print("rf err ", float(jnp.max(jnp.abs(rf - rf_r))))
print("beta err", float(jnp.max(jnp.abs(bt - bt_r))))

# timing at bench geometry, bf16
params16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
qkv = jnp.ones((B, G * G, 3 * DIM), jnp.bfloat16)
pq = params16["params"]["adaptive_mu_q"]
pk = params16["params"]["adaptive_mu_k"]


def kern(c):
    rf, bt = eva_summaries_packed(
        c, pq["layers_0"]["kernel"], pq["layers_0"]["bias"],
        pk["layers_0"]["kernel"], pk["layers_0"]["bias"],
        pq["layers_1"]["scale"], pq["layers_1"]["bias"],
        pk["layers_1"]["scale"], pk["layers_1"]["bias"],
        nh=NH, gw=G, j=J, use_ln=True)
    return c + (rf.sum() + bt.sum()).astype(c.dtype) * 0


print(f"pallas summaries {timeit_loop(kern, qkv):7.3f} ms", flush=True)


def xla_form(c):
    rf, bt = nn.apply(
        lambda mod, q: mod._chunk_summaries_packed(q, (G, G), J, True),
        m)(params16, c)
    return c + (rf.sum() + bt.sum()).astype(c.dtype) * 0


print(f"xla summaries    {timeit_loop(xla_form, qkv):7.3f} ms", flush=True)
