"""BASE-layer mixture-of-experts (TPU-native).

Re-design of ``fairseq/fairseq/modules/base_layer.py`` ("BASE Layers:
Simplifying Training of Large, Sparse Models", Lewis et al. 2021): a single
expert-routed FFN block whose token->expert assignment is a *balanced*
linear assignment, so no auxiliary load-balancing loss is needed.

Reference -> TPU mapping:
  * one expert per data-parallel GPU + ragged ``all_to_all_single``
    (``base_layer.py:17,55-58``)  ->  ``num_experts`` as a leading param/
    activation axis; because loads are exactly balanced the routed tensor
    is dense ``[E, k, D]``, so expert parallelism is ordinary sharding of
    that axis over the mesh (``parallel/mesh.py`` rules; XLA inserts the
    all-to-alls) with every shape static under ``jit``.
  * host C++ auction assignment (``base_layer.py:89-96``) -> on-device
    deferred-acceptance routing (``ops/routing.py``), parity-tested
    against the native auction twin (``native.balanced_assignment``).
  * eval-time load-ignorant greedy assignment (``base_layer.py:98-109``)
    -> one-round greedy under capacity; overflow tokens bypass the expert
    through the residual identity path (static-shape divergence,
    documented in ``ops/routing.py``).

Semantics kept exactly: affinities are computed outside the gradient tape
(``torch.no_grad`` -> ``stop_gradient``); expert outputs are mixed with the
residual stream by ``alpha = sigmoid(x . centroid_e)`` so centroids learn
through the mixing term (``base_layer.py:61-68``); expert FFN sublayers are
pre-LN residual blocks with a zero-initialised second projection, making
the whole layer an exact identity at initialisation
(``base_layer.py:125-137``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficient_attention_tpu.ops.routing import (
    balanced_route,
    gather_padded,
    greedy_route,
    inverse_scatter,
)


class BaseSublayer(nn.Module):
    """Pre-LN residual FFN with zero-init ``ff2`` (``base_layer.py:125-137``)."""

    dim: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.ffn_dim, name="ff1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="ff2",
                     kernel_init=nn.initializers.zeros)(h)
        return x + h


class _ExpertStack(nn.Module):
    dim: int
    ffn_dim: int
    sublayers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.sublayers):
            x = BaseSublayer(self.dim, self.ffn_dim, name=f"sub_{i}")(x)
        return x


class BaseLayer(nn.Module):
    """Balanced-assignment MoE layer; drop-in between transformer layers."""

    dim: int
    ffn_dim: int
    num_experts: int
    sublayers: int = 1
    shuffle: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, D = x.shape
        E = self.num_experts
        N = B * T
        k = -(-N // E)  # ceil: capacity per expert

        centroids = self.param(
            "expert_centroids", nn.initializers.orthogonal(scale=0.1),
            (E, D), jnp.float32)
        experts = nn.vmap(
            _ExpertStack,
            in_axes=0, out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(self.dim, self.ffn_dim, self.sublayers, name="experts")

        feats = x.reshape(N, D)
        if self.shuffle and not deterministic:
            # break within-batch correlations before routing
            # (``base_layer.py:40-43``); routing is global here, so a plain
            # permutation of the token axis plays the reference's
            # shuffle-all-to-all role
            perm = jax.random.permutation(self.make_rng("dropout"), N)
            feats = feats[perm]

        # routing affinities live outside the gradient tape
        # (``base_layer.py:44-49``)
        aff = jax.lax.stop_gradient(
            feats.astype(jnp.float32) @ centroids.T)          # [N, E]
        slots = (balanced_route(aff, k) if not deterministic
                 else greedy_route(aff, k))                    # [E, k]

        routed = gather_padded(feats, slots)                   # [E, k, D]
        out = experts(routed)
        alpha = jax.nn.sigmoid(
            jnp.einsum("ekd,ed->ek", routed.astype(jnp.float32),
                       centroids))[..., None].astype(x.dtype)
        mixed = alpha * out + (1.0 - alpha) * routed
        result = inverse_scatter(feats, slots, mixed)

        if self.shuffle and not deterministic:
            inv = jnp.zeros((N,), jnp.int32).at[perm].set(jnp.arange(N))
            result = result[inv]
        return result.reshape(B, T, D)


def base_layer_positions(num_layers: int, num_base: int) -> list:
    """After how many decoder layers each BASE layer runs (non-decreasing).

    Simulates the reference's sequential ``layers.insert(((i+1)*L)//(B+1),
    BaseLayer)`` into the growing module list
    (``transformer_decoder.py:166-171``) and reads off, for every BASE
    layer in the final order, how many decoder layers precede it.
    """
    seq = ["d"] * num_layers
    for i in range(num_base):
        seq.insert(((i + 1) * num_layers) // (num_base + 1), "b")
    out, count = [], 0
    for s in seq:
        if s == "b":
            out.append(count)
        else:
            count += 1
    return out
