"""Capacity-constrained expert routing for BASE-layer MoE, on device.

The reference routes tokens to experts with a host-side C++ auction solving
a balanced linear-assignment problem (``fairseq/modules/base_layer.py:89-96``
calling ``fairseq/clib/libbase/balanced_assignment.cpp``) and moves them with
ragged ``all_to_all_single`` collectives.  Neither survives on TPU: a
host callback per layer per step would serialize the pipeline, and XLA
collectives are static-shape.

The TPU-native replacement keeps the property that makes BASE attractive in
the first place — EXACTLY balanced expert loads — and exploits it: with k
tokens per expert the routed tensor is a dense ``[E, k, D]`` block, so expert
parallelism is plain sharding of a leading axis (XLA inserts the all-to-alls)
and every shape is static under ``jit``.

The assignment itself is expert-proposing deferred acceptance
(Gale-Shapley): each round, every unassigned token bids for its best
non-full expert; each expert keeps its ``capacity`` best bidders by
affinity.  A rejected token's chosen expert is full from then on, so after
at most E rounds every token is assigned — the loop is a statically
unrolled E rounds of ``[N, E]`` masking + per-expert ``top_k``.  This is an
approximation of the auction's epsilon-optimal assignment (parity-tested
against the native twin ``native.balanced_assignment`` on total affinity),
chosen because it is exact on load balance, deterministic, and entirely
MXU/VPU-friendly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30


def route(aff: jax.Array, capacity: int, rounds: int) -> jax.Array:
    """Assign tokens to experts under a per-expert ``capacity``.

    Args:
      aff: ``[N, E]`` token-expert affinities.
      capacity: max tokens per expert (``k``).
      rounds: deferred-acceptance rounds. ``E`` gives the balanced
        assignment (every token placed, training mode); ``1`` gives greedy
        top-choice with capacity (eval mode — the static-shape analogue of
        the reference's load-ignorant ``greedy_assignment``; overflow
        tokens bypass the experts via the residual identity path).

    Returns:
      ``slots [E, capacity]`` int32 token indices; empty slots hold the
      sentinel ``N`` (gather from a zero-padded row / scatter-dropped).
    """
    N, E = aff.shape
    aff = aff.astype(jnp.float32)
    slots = jnp.full((E, capacity), N, jnp.int32)
    cap = jnp.full((E,), capacity, jnp.int32)
    expert_open = jnp.ones((E,), bool)
    unassigned = jnp.ones((N,), bool)
    col = jnp.arange(E)[None, :]
    rank = jnp.arange(capacity)[None, :]
    for _ in range(rounds):
        masked = jnp.where(unassigned[:, None] & expert_open[None, :],
                           aff, _NEG)
        choice = jnp.argmax(masked, axis=1)                    # [N]
        valid = jnp.max(masked, axis=1) > _NEG / 2
        # each expert sees only this round's bidders, scored by affinity
        bids = jnp.where((col == choice[:, None]) & valid[:, None],
                         aff, _NEG).T                          # [E, N]
        vals, idx = jax.lax.top_k(bids, capacity)              # [E, cap]
        accept = (rank < cap[:, None]) & (vals > _NEG / 2)
        tok = jnp.where(accept, idx, N).astype(jnp.int32)
        # append accepted tokens into each expert's free slots: slot j is
        # free iff j >= used; accepted bidder r lands in slot used + r
        used = capacity - cap
        acc_rank = jnp.cumsum(accept.astype(jnp.int32), axis=1) - 1
        dest = jnp.where(accept, used[:, None] + acc_rank, capacity)
        slots = jnp.asarray(jax.vmap(
            lambda s, d, t: s.at[d].set(t, mode="drop"))(slots, dest, tok))
        n_acc = accept.sum(axis=1)
        cap = cap - n_acc
        expert_open = cap > 0
        assigned_now = jnp.zeros((N + 1,), bool).at[tok.reshape(-1)].set(
            True, mode="drop")[:N]
        unassigned = unassigned & ~assigned_now
    return slots


def balanced_route(aff: jax.Array, capacity: int) -> jax.Array:
    """Training-mode routing: every token assigned, loads exactly balanced
    (up to the ceil remainder when ``N % E != 0``)."""
    return route(aff, capacity, rounds=aff.shape[1])


def greedy_route(aff: jax.Array, capacity: int) -> jax.Array:
    """Eval-mode routing: one round of top-choice bids under capacity."""
    return route(aff, capacity, rounds=1)


def inverse_scatter(base: jax.Array, slots: jax.Array,
                    values: jax.Array) -> jax.Array:
    """Scatter ``values [E, k, D]`` back to token rows of ``base [N, D]``;
    sentinel slots are dropped, unrouted tokens keep their ``base`` row."""
    flat = slots.reshape(-1)
    return base.at[flat].set(values.reshape(-1, values.shape[-1]),
                             mode="drop")


def gather_padded(features: jax.Array, slots: jax.Array) -> jax.Array:
    """Gather ``[E, k, D]`` routed features; sentinel slots read zeros."""
    padded = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[-1]), features.dtype)])
    return padded[slots]


def routed_counts(slots: jax.Array, n_tokens: int) -> Tuple[jax.Array, jax.Array]:
    """(tokens per expert, total routed) — for tests/metrics."""
    real = slots < n_tokens
    return real.sum(axis=1), real.sum()
