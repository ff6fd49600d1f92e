"""Jitted train/eval steps for LM and MT models.

The fairseq Trainer's fwd/bwd/all-reduce/step choreography
(``trainer.py:716-1022``) reduced to pure functions over TrainState:
gradients are averaged across the mesh by XLA from sharding constraints,
grad accumulation is a ``lax.scan`` over microbatches, loss scaling is
unnecessary in bf16.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from efficient_attention_tpu.training.criterions import (
    adaptive_loss,
    label_smoothed_nll_loss,
)
from efficient_attention_tpu.training.train_state import (
    StepMetrics,
    TrainState,
    apply_or_skip,
    cast_params,
)




def make_lm_train_step(pad_idx: int = 1, accum_steps: int = 1,
                       use_adaptive: bool = False,
                       skip_nonfinite: bool = True,
                       compute_dtype=None):
    """LM step over (tokens, targets): next-token NLL / adaptive loss
    (``criterions/{cross_entropy,adaptive_loss}.py`` + LM recipe).
    ``compute_dtype=jnp.bfloat16`` enables mixed precision (--bf16)."""

    def loss_fn(params, apply_fn, tokens, targets, rng):
        params = cast_params(params, compute_dtype)
        rngs = {"dropout": rng, "sample": jax.random.fold_in(rng, 7)}
        if use_adaptive:
            nll = apply_fn(params, tokens, targets, deterministic=False,
                           rngs=rngs, method="loss")
            loss_sum, ntokens = adaptive_loss(nll, targets, pad_idx)
        else:
            logits = apply_fn(params, tokens, deterministic=False, rngs=rngs)
            loss_sum, _, ntokens = label_smoothed_nll_loss(
                logits, targets, epsilon=0.0, pad_idx=pad_idx)
        return loss_sum / jnp.maximum(ntokens, 1.0), ntokens

    def train_step(state: TrainState, tokens, targets, rng
                   ) -> Tuple[TrainState, StepMetrics]:
        rng = jax.random.fold_in(rng, state.step)
        if accum_steps == 1:
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.apply_fn, tokens, targets, rng)
        else:
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
                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state.apply_fn, tk, tg,
                    jax.random.fold_in(rng, i))
                return (loss_acc + loss,
                        jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (0.0, zero),
                (tok_mb, tgt_mb, jnp.arange(accum_steps)))
            loss = loss / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        grad_norm = optax.global_norm(grads)
        if skip_nonfinite:
            new_state, skipped = apply_or_skip(state, grads, loss, grad_norm)
            return new_state, StepMetrics(loss, grad_norm, skipped)
        return state.apply_gradients(grads), StepMetrics(loss, grad_norm)

    return train_step


def _token_nll(params, apply_fn, tokens, targets, use_adaptive,
               softmax_chunk=None):
    """Per-token NLL ``[B, T]``.  With ``softmax_chunk`` the output
    projection + log-softmax run over flattened ``B*T`` tokens in fixed
    slices of that many tokens, so at most ``[chunk, V]`` logits are live
    — fairseq's ``SequenceScorer.batch_for_softmax``
    (``sequence_scorer.py``: flatten to ``[1, B*T, dim]`` then slice by
    ``softmax_batch``)."""
    if use_adaptive:
        # the adaptive NLL already streams the vocab in fixed chunks
        # (models/adaptive_softmax.py) — no extra bounding needed
        return apply_fn(params, tokens, targets, deterministic=True,
                        method="loss")
    if softmax_chunk:
        feats = apply_fn(params, tokens, deterministic=True,
                         features_only=True)
        b, t, d = feats.shape
        pad = (-(b * t)) % softmax_chunk
        flat = feats.reshape(b * t, d)
        flat_tgt = targets.reshape(b * t)
        if pad:
            flat = jnp.pad(flat, ((0, pad), (0, 0)))
            flat_tgt = jnp.pad(flat_tgt, (0, pad))
        n_chunks = flat.shape[0] // softmax_chunk
        nll = jax.lax.map(
            lambda xs: apply_fn(params, xs[0], xs[1],
                                method="nll_from_features"),
            (flat.reshape(n_chunks, softmax_chunk, d),
             flat_tgt.reshape(n_chunks, softmax_chunk)))
        return nll.reshape(-1)[: b * t].reshape(b, t)
    logits = apply_fn(params, tokens, deterministic=True)
    return -jnp.take_along_axis(
        jax.nn.log_softmax(logits.astype(jnp.float32), -1),
        targets[..., None], axis=-1)[..., 0]


def make_lm_eval_step(use_adaptive: bool = False, pad_idx: int = 1,
                      softmax_chunk=None):
    """Returns summed NLL + token count for PPL aggregation
    (``fairseq_cli/eval_lm.py`` scoring).  ``softmax_chunk`` bounds the
    live logits to that many tokens' worth (--softmax-batch)."""

    def eval_step(params, apply_fn, tokens, targets, score_mask):
        nll = _token_nll(params, apply_fn, tokens, targets, use_adaptive,
                         softmax_chunk)
        mask = score_mask & (targets != pad_idx)
        return jnp.sum(nll * mask), jnp.sum(mask)

    return eval_step


def make_lm_token_nll_step(use_adaptive: bool = False, pad_idx: int = 1,
                           softmax_chunk=None):
    """Per-token NLL ``[B, T]`` + score mask — the SequenceScorer form
    feeding ``eval_lm --output-word-probs/--output-word-stats``
    (``fairseq/sequence_scorer.py`` ``pos_scores``)."""

    def token_step(params, apply_fn, tokens, targets, score_mask):
        nll = _token_nll(params, apply_fn, tokens, targets, use_adaptive,
                         softmax_chunk)
        mask = score_mask & (targets != pad_idx)
        return nll, mask

    return token_step


def make_mt_train_step(pad_idx: int = 1, label_smoothing: float = 0.1,
                       accum_steps: int = 1, skip_nonfinite: bool = True,
                       compute_dtype=None, sentence_avg: bool = False):
    """MT step over (src, prev_out, targets) with label-smoothed CE
    (``criterions/label_smoothed_cross_entropy.py``, the WMT recipe).
    ``compute_dtype=jnp.bfloat16`` enables mixed precision (--bf16);
    ``sentence_avg`` normalizes by sentence count instead of tokens
    (fairseq --sentence-avg sample_size semantics)."""

    def loss_fn(params, apply_fn, src, prev, targets, rng):
        params = cast_params(params, compute_dtype)
        rngs = {"dropout": rng, "sample": jax.random.fold_in(rng, 7)}
        logits = apply_fn(params, src, prev, deterministic=False, rngs=rngs)
        loss_sum, nll_sum, ntokens = label_smoothed_nll_loss(
            logits, targets, epsilon=label_smoothing, pad_idx=pad_idx)
        n = (jnp.asarray(targets.shape[0], jnp.float32) if sentence_avg
             else jnp.maximum(ntokens, 1.0))
        return loss_sum / n, nll_sum / n

    def train_step(state: TrainState, src, prev, targets, rng):
        rng = jax.random.fold_in(rng, state.step)
        if accum_steps == 1:
            (loss, nll), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.apply_fn, src, prev, targets, rng)
        else:
            if src.shape[0] % accum_steps:
                raise ValueError(
                    f"batch {src.shape[0]} not divisible by "
                    f"--update-freq {accum_steps}")
            mb = src.shape[0] // accum_steps

            def body(carry, xs):
                loss_acc, nll_acc, grad_acc = carry
                s, p, t, i = xs
                (loss, nll), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state.apply_fn, s, p, t,
                    jax.random.fold_in(rng, i))
                return (loss_acc + loss, nll_acc + nll,
                        jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, nll, grads), _ = jax.lax.scan(
                body, (0.0, 0.0, zero),
                (src.reshape(accum_steps, mb, src.shape[1]),
                 prev.reshape(accum_steps, mb, prev.shape[1]),
                 targets.reshape(accum_steps, mb, targets.shape[1]),
                 jnp.arange(accum_steps)))
            loss, nll = loss / accum_steps, nll / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        grad_norm = optax.global_norm(grads)
        if skip_nonfinite:
            new_state, skipped = apply_or_skip(state, grads, loss, grad_norm)
            return new_state, StepMetrics(loss, grad_norm, skipped)
        return state.apply_gradients(grads), StepMetrics(loss, grad_norm)

    return train_step


def make_mt_eval_step(pad_idx: int = 1, label_smoothing: float = 0.1):
    """Validation loss for the translation task (``fairseq_cli/train.py``
    ``validate`` -> ``task.valid_step``): summed smoothed loss / raw NLL /
    token count, deterministic forward."""

    def eval_step(params, apply_fn, src, prev, targets):
        logits = apply_fn(params, src, prev, deterministic=True)
        loss_sum, nll_sum, ntokens = label_smoothed_nll_loss(
            logits, targets, epsilon=label_smoothing, pad_idx=pad_idx)
        return loss_sum, nll_sum, ntokens

    return eval_step
