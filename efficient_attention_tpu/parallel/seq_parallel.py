"""Sequence/context parallelism for EVA-style window+chunk attention.

The reference has NO sequence parallelism (SURVEY §2.3 item 7) — its
long-context strategy is algorithmic.  That structure shards perfectly:
blocked local attention is embarrassingly parallel along the window axis,
and the global branch needs only an all-gather of the tiny ``[c, d]`` chunk
summaries (``rf_k_bar``/``beta``) across the ``seq`` mesh axis — the
idiomatic TPU replacement for ring attention, riding ICI with O(c*d) bytes
instead of O(n*d).

Use inside ``shard_map`` over a mesh with a ``seq`` axis; windows and chunks
must not straddle shard boundaries (``N_shard % window == 0``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from efficient_attention_tpu.attention.base import MASK_VAL

Array = jax.Array


def gather_chunk_summaries(rf_k_bar: Array, beta: Array, axis_name: str
                           ) -> Tuple[Array, Array]:
    """All-gather per-shard chunk summaries along the chunk axis.

    rf_k_bar/beta: ``[b, h, c_local, d]`` -> ``[b, h, c_total, d]``.
    """
    rf = jax.lax.all_gather(rf_k_bar, axis_name, axis=2, tiled=True)
    bt = jax.lax.all_gather(beta, axis_name, axis=2, tiled=True)
    return rf, bt


def eva_joint_attention_shard(
    w_q: Array,  # [b, h, g_local, s, d] this shard's windows
    w_k: Array,
    w_v: Array,
    rf_k_bar_local: Array,  # [b, h, c_local, d] this shard's chunk summaries
    beta_local: Array,
    scale: float,
    axis_name: str,
    bias: Optional[Array] = None,  # [h, s, s]
) -> Array:
    """Sequence-parallel EVA attention: local windows stay on-shard, chunk
    summaries are all-gathered (the only collective).  Matches the global
    joint-softmax computation (``eva.py:200-227``) exactly."""
    rf_k_bar, beta = gather_chunk_summaries(
        rf_k_bar_local, beta_local, axis_name)
    local = jnp.einsum("bhgid,bhgjd->bhgij", w_q, w_k,
                       preferred_element_type=jnp.float32) * scale
    if bias is not None:
        local = local + bias[None, :, None].astype(local.dtype)
    chunk = jnp.einsum("bhgid,bhcd->bhgic", w_q, scale * rf_k_bar)
    s = local.shape[-1]
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk.astype(local.dtype)], axis=-1), axis=-1
    ).astype(w_v.dtype)
    return (jnp.einsum("bhgij,bhgjd->bhgid", attn[..., :s], w_v)
            + jnp.einsum("bhgic,bhcd->bhgid", attn[..., s:], beta))


def causal_eva_attention_shard(
    w_q: Array,  # [b, h, g_local, w, d] this shard's causal windows
    w_k: Array,
    w_v: Array,
    rf_k_bar_local: Array,  # [b, h, c_local, d] this shard's chunk summaries
    beta_local: Array,
    scale: float,
    axis_name: str,
    chunk_size: int,
    bias: Optional[Array] = None,  # [w, w] head-shared T5 bias
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,  # already folded per shard
) -> Array:
    """Sequence-parallel CAUSAL EVA (the LM family's context parallelism).

    The decoder analogue of :func:`eva_joint_attention_shard`
    (``causal_eva.py:666-788`` semantics): causal windows are shard-local
    (no halo — ``overlap_window=False``), chunk summaries are all-gathered
    (the only collective, O(c*d) bytes over ICI), and chunk causality uses
    GLOBAL positions: a query at global position p sees gathered chunk c
    iff ``c < p // chunk_size``.  Shards must hold whole windows
    (``n_local % window == 0``) and windows whole chunks.
    """
    rf_k_bar, beta = gather_chunk_summaries(
        rf_k_bar_local, beta_local, axis_name)
    shard = jax.lax.axis_index(axis_name)
    _, _, g_local, w, _ = w_q.shape
    c_total = rf_k_bar.shape[2]

    local = jnp.einsum("bhgid,bhgjd->bhgij", w_q, w_k,
                       preferred_element_type=jnp.float32) * scale
    if bias is not None:
        local = local + bias[None, None, None].astype(local.dtype)
    tri = jnp.triu(jnp.ones((w, w), bool), 1)
    local = jnp.where(tri[None, None, None], MASK_VAL, local)

    chunk = jnp.einsum("bhgid,bhcd->bhgic", w_q, scale * rf_k_bar)
    # global position of query (g, i) on this shard
    pos = ((shard * g_local + jnp.arange(g_local))[:, None] * w
           + jnp.arange(w)[None, :])                     # [g_local, w]
    blocked = (jnp.arange(c_total)[None, None, :]
               >= (pos // chunk_size)[..., None])        # [g, i, c]
    chunk = jnp.where(blocked[None, None], MASK_VAL, chunk)

    s = local.shape[-1]
    attn = jax.nn.softmax(
        jnp.concatenate([local, chunk.astype(local.dtype)], axis=-1), axis=-1
    ).astype(w_v.dtype)
    if dropout_rng is not None and dropout_rate > 0.0:
        # attention-probability dropout on the joint weights, matching the
        # non-SP path (reference ``causal_eva.py:778``); flax Dropout
        # semantics (inverted scaling), rng pre-folded per sequence shard
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate),
                         jnp.zeros_like(attn))
    return (jnp.einsum("bhgij,bhgjd->bhgid", attn[..., :s], w_v)
            + jnp.einsum("bhgic,bhcd->bhgid", attn[..., s:], beta))


def make_seq_parallel_lm_train_step(mesh, model, pad_idx: int = 1,
                                    skip_nonfinite: bool = True,
                                    accum_steps: int = 1,
                                    compute_dtype=None):
    """Jitted LM train step with the sequence dimension sharded over the
    mesh's ``seq`` axis (and batch over ``data``).

    The model must be built with ``seq_axis='seq'`` (causal-EVA decoder):
    the whole forward/backward runs inside ``shard_map`` on local
    ``[B/dp, T/sp]`` token shards — local windows never leave their shard,
    the only attention collective is the tiny chunk-summary all-gather, and
    gradients are psum'd across both axes.  This is the CLI surface for the
    reference-absent sequence parallelism (SURVEY §2.3 item 7: the TPU
    extension replacing ring attention).
    """
    import optax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from efficient_attention_tpu.training.train_state import (
        StepMetrics,
        apply_or_skip,
    )

    axes = ("data", "seq")

    use_adaptive = getattr(model, "adaptive_cutoffs", None) is not None

    def local_loss(params, tokens, targets, rng):
        if compute_dtype is not None:
            from efficient_attention_tpu.training.train_state import (
                cast_params,
            )

            params = cast_params(params, compute_dtype)
        rngs = {"dropout": rng, "sample": jax.random.fold_in(rng, 7)}
        mask = (targets != pad_idx).astype(jnp.float32)
        if use_adaptive:
            nll = model.apply(params, tokens, targets, deterministic=False,
                              rngs=rngs, method="loss") * mask
        else:
            logits = model.apply(params, tokens, deterministic=False,
                                 rngs=rngs)
            nll = optax.softmax_cross_entropy_with_integer_labels(
                logits, targets) * mask
        loss_sum = jax.lax.psum(jnp.sum(nll), axes)
        ntok = jax.lax.psum(jnp.sum(mask), axes)
        return loss_sum / jnp.maximum(ntok, 1.0)

    def sharded_grads(params, tokens, targets, rng):
        loss, grads = jax.value_and_grad(local_loss)(
            params, tokens, targets, rng)
        # local_loss is already psum'd, but each shard's backward only sees
        # its local contribution — sum them
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axes), grads)
        return loss, grads

    smapped = shard_map(
        sharded_grads, mesh=mesh,
        in_specs=(P(), P("data", "seq"), P("data", "seq"), P()),
        out_specs=(P(), P()), check_rep=False)

    def train_step(state, tokens, targets, rng):
        rng = jax.random.fold_in(rng, state.step)
        if accum_steps == 1:
            loss, grads = smapped(state.params, tokens, targets, rng)
        else:
            # grad accumulation over microbatches (fairseq --update-freq):
            # scan outside the shard_map, averaging at the end
            if tokens.shape[0] % accum_steps:
                raise ValueError(
                    f"batch {tokens.shape[0]} not divisible by "
                    f"--update-freq {accum_steps}")
            mb = tokens.shape[0] // accum_steps
            # explicit T: a wrong batch errors instead of silently re-
            # slicing tokens across samples
            tok_mb = tokens.reshape(accum_steps, mb, tokens.shape[1])
            tgt_mb = targets.reshape(accum_steps, mb, targets.shape[1])

            def body(carry, xs):
                loss_acc, grad_acc = carry
                tk, tg, i = xs
                l, g = smapped(state.params, tk, tg,
                               jax.random.fold_in(rng, i))
                return (loss_acc + l,
                        jax.tree_util.tree_map(jnp.add, grad_acc, g)), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (0.0, zero),
                (tok_mb, tgt_mb, jnp.arange(accum_steps)))
            loss = loss / accum_steps
            grads = jax.tree_util.tree_map(
                lambda g: g / accum_steps, grads)
        import optax as _optax

        grad_norm = _optax.global_norm(grads)
        if skip_nonfinite:
            new_state, skipped = apply_or_skip(state, grads, loss, grad_norm)
            return new_state, StepMetrics(loss, grad_norm, skipped)
        return state.apply_gradients(grads), StepMetrics(loss, grad_norm)

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data", "seq"))
    return jax.jit(train_step,
                   in_shardings=(repl, data_sh, data_sh, None),
                   out_shardings=(repl, None), donate_argnums=(0,))
