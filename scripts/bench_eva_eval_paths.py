"""In-module timing of the four eval-path variants (summary kernel on/off x
fused out-proj on/off) at the bench geometry."""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import jax
import jax.numpy as jnp

from _bench_util import timeit_loop
from efficient_attention_tpu import AttentionFactory

B = 128
BASE = {"dim": 192, "num_heads": 3, "window_size": 7, "num_landmarks": 49,
        "attn_2d": True, "use_rpe": True, "adaptive_proj": "default",
        "impl": "packed"}

x = jnp.ones((B, 28, 28, 192), jnp.bfloat16)
for ps in (False, True):
    for fo in (False, True):
        m = AttentionFactory.build_attention(
            "eva", dict(BASE, use_pallas_summaries=ps, fuse_output_proj=fo,
                        use_megakernel=False))
        params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                        deterministic=True))()
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), params)

        def fwd(x, params):
            return m.apply(params, x, deterministic=True).astype(x.dtype)

        ms = timeit_loop(fwd, x, params, n1=5, n2=25)
        print(f"summaries_kernel={int(ps)} fused_out={int(fo)} "
              f"{ms:7.3f} ms/layer", flush=True)

# megakernel path (reads x, recomputes qkv in-kernel)
m = AttentionFactory.build_attention(
    "eva", dict(BASE, use_megakernel=True))
params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x,
                                deterministic=True))()
params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)


def fwd(x, params):
    return m.apply(params, x, deterministic=True).astype(x.dtype)


ms = timeit_loop(fwd, x, params, n1=5, n2=25)
print(f"megakernel                   {ms:7.3f} ms/layer", flush=True)
