"""Decompose the NON-attention floor of DeiT-tiny-p8 at the bench geometry.

VERDICT r2 items 1b: the shared non-attention floor is ~9.9 ms/batch while a
roofline puts the MLP-dominated model floor near ~5 ms.  This script
slope-times each constituent at [128, 28, 28, 192] bf16 so the gap has a
measured owner:

  - identity-attention model (attention replaced by a no-op) = the true floor
  - LayerNorm alone
  - GatedMlp alone (fc1 + gelu + fc2)
  - LN + MLP + residual as a block half
  - patch embed (+pos emb), final norm + mean-pool + head
  - x @ W for the two MLP matmul shapes in isolation (MXU ceiling check)
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import jax
import jax.numpy as jnp
from flax import linen as nn

from _bench_util import timeit_loop
from efficient_attention_tpu.models import create_model
from efficient_attention_tpu.models.layers import GatedMlp, PatchEmbed

B = 128
D = 192
G = 28
N = G * G


def _p(model, x):
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1]
                                        if x.ndim == 4 and x.shape[-1] == 3
                                        else x))()
    return jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)


def time_module(m, x, **kw):
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    def fwd(x, params):
        return m.apply(params, x).astype(x.dtype)

    return timeit_loop(fwd, x, params, **kw)


class IdentityAttn(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic=True):
        return x


class FloorBlock(nn.Module):
    """One block half: LN + MLP + residual (the repeated non-attn unit)."""

    @nn.compact
    def __call__(self, x):
        h = GatedMlp(hidden_features=4 * D)(nn.LayerNorm(epsilon=1e-6)(x))
        return x + h


class IdentityModel(nn.Module):
    """DeiT-tiny-p8 with attention removed: patch embed + pos + 12x
    (LN + identity + LN + MLP) + final norm + head."""

    depth: int = 12

    @nn.compact
    def __call__(self, x):
        x = PatchEmbed(patch_size=8, embed_dim=D)(x)
        x = x + self.param("pos", nn.initializers.zeros, (1, G, G, D))
        for _ in range(self.depth):
            x = x + nn.LayerNorm(epsilon=1e-6)(x)  # attn half stub (LN only)
            x = x + GatedMlp(hidden_features=4 * D)(nn.LayerNorm(epsilon=1e-6)(x))
        Bz = x.shape[0]
        x = nn.LayerNorm(epsilon=1e-6)(x.reshape(Bz, N, D))
        x = jnp.mean(x, axis=1)
        return nn.Dense(1000)(x)


def main():
    xtok = jnp.ones((B, G, G, D), jnp.bfloat16)
    ximg = jnp.ones((B, 224, 224, 3), jnp.bfloat16)

    # identity-attn full model
    m = IdentityModel()
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), ximg[:1]))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    def fwd(x, p):
        return x + m.apply(p, x).mean().astype(x.dtype)

    ms = timeit_loop(fwd, ximg, params, n1=3, n2=13)
    print(f"identity-attn model      {ms:8.3f} ms/fwd", flush=True)

    print(f"LayerNorm [B,28,28,192]  {time_module(nn.LayerNorm(epsilon=1e-6), xtok):8.3f} ms", flush=True)
    print(f"GatedMlp                  {time_module(GatedMlp(hidden_features=4 * D), xtok):8.3f} ms", flush=True)
    print(f"LN+MLP+residual           {time_module(FloorBlock(), xtok):8.3f} ms", flush=True)

    # raw matmuls (MXU ceiling): x[B*N,192]@W[192,768] and back
    w1 = jnp.ones((D, 4 * D), jnp.bfloat16)
    w2 = jnp.ones((4 * D, D), jnp.bfloat16)

    def mm(x, w1, w2):
        h = x.reshape(B * N, D) @ w1
        return (h @ w2).reshape(x.shape).astype(x.dtype)

    print(f"fc1@fc2 raw matmuls       {timeit_loop(mm, xtok, w1, w2):8.3f} ms", flush=True)

    def mm_gelu(x, w1, w2):
        h = jax.nn.gelu(x.reshape(B * N, D) @ w1)
        return (h @ w2).reshape(x.shape).astype(x.dtype)

    print(f"fc1+gelu+fc2              {timeit_loop(mm_gelu, xtok, w1, w2):8.3f} ms", flush=True)

    # patch embed alone
    pe = PatchEmbed(patch_size=8, embed_dim=D)
    params = jax.jit(lambda: pe.init(jax.random.PRNGKey(0), ximg[:1]))()
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    def pef(x, p):
        return x + pe.apply(p, x).mean().astype(x.dtype)

    print(f"patch embed               {timeit_loop(pef, ximg, params, n1=3, n2=13):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
