"""Unified TrainState + the jitted ViT train/eval steps.

The reference's Trainer machinery (``fairseq/trainer.py`` 1.5k LoC of
grad-accum / fp16 / DDP plumbing, plus ``vit/engine.py``) collapses into:
one pytree TrainState, one jitted train_step whose gradients are averaged
across the mesh by XLA-inserted collectives, grad accumulation as a
``lax.scan`` over microbatches, and EMA as a pytree lerp.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from efficient_attention_tpu.data.mixup import (
    MixupConfig,
    apply_mixup,
    one_hot_smooth,
    soft_target_cross_entropy,
)

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    apply_fn: Callable = struct.field(pytree_node=False, default=None)
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, apply_fn, params, tx, ema_decay: float = 0.0):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None,
            apply_fn=apply_fn,
            tx=tx,
            ema_decay=ema_decay,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), self.ema_params, new_params)
        return self.replace(
            step=self.step + 1, params=new_params,
            opt_state=new_opt_state, ema_params=new_ema)


class StepMetrics(NamedTuple):
    loss: Array
    grad_norm: Array
    # True when the update was skipped because loss/grads were non-finite
    # (the bf16 analogue of fairseq's overflow->skip-update recovery,
    # ``trainer.py:911-920``); None when skip-recovery is disabled
    skipped: Optional[Array] = None


def apply_or_skip(state: "TrainState", grads, loss: Array,
                  grad_norm: Array) -> Tuple["TrainState", Array]:
    """Apply gradients unless loss/grad-norm is non-finite, in which case
    return the state UNCHANGED (step not incremented, optimizer untouched)
    so training continues as if the poisoned batch never arrived.

    This is the bf16 translation of the reference's gradient-overflow
    recovery (``fairseq/trainer.py:911-920``: OverflowError -> zero grads,
    skip the update, continue): with no loss scale to shrink, a non-finite
    step is simply dropped.  Returns ``(new_state, skipped)``.
    """
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    new_state = state.apply_gradients(grads)
    merged = jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new_state, state)
    return merged, ~ok


def cast_params(params, compute_dtype):
    """Mixed precision (fairseq --fp16/--amp, TPU form): f32 MASTER params
    live in the TrainState/optimizer; the forward consumes a bf16 copy,
    and the cast's VJP returns f32 gradients — the master-copy scheme of
    ``fairseq/optim/fp16_optimizer.py`` with the cast fused into the step
    instead of a separate flattened buffer (bf16's range also removes the
    need for loss scaling)."""
    if compute_dtype is None:
        return params
    return jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)


def make_vit_train_step(
    mixup_cfg: Optional[MixupConfig],
    num_classes: int,
    label_smoothing: float = 0.1,
    accum_steps: int = 1,
    erasing_cfg=None,
    skip_nonfinite: bool = False,
    compute_dtype=None,
):
    """Jittable ViT train step (replaces ``vit/engine.py:train_one_epoch``
    inner loop).  With ``accum_steps > 1`` microbatches are scanned, matching
    fairseq's GroupedIterator/no_sync accumulation (``trainer.py:735-801``) —
    no psum per microbatch, gradients averaged once at the end by XLA.
    ``erasing_cfg`` (``data.erasing.ErasingConfig``) enables device-side
    random erasing before mixup, matching the DeiT transform order
    (normalize -> erase per image, then batch mixup).
    """

    def loss_fn(params, apply_fn, images, targets, rng):
        if compute_dtype is not None:
            # mixed precision (--bf16): f32 master params, bf16 compute;
            # the cast's VJP restores f32 gradients (see cast_params)
            params = cast_params(params, compute_dtype)
            images = images.astype(compute_dtype)
        drop_rng, sample_rng = jax.random.split(rng)
        logits = apply_fn(
            params, images, deterministic=False,
            rngs={"dropout": drop_rng, "sample": sample_rng})
        return soft_target_cross_entropy(logits, targets)

    def single_grad(params, apply_fn, rng, images, labels):
        if erasing_cfg is not None and erasing_cfg.prob > 0:
            from efficient_attention_tpu.data.erasing import (
                apply_random_erasing,
            )

            erase_rng, rng = jax.random.split(rng)
            images = apply_random_erasing(erase_rng, images, erasing_cfg)
        if mixup_cfg is not None:
            mix_rng, rng = jax.random.split(rng)
            images, targets = apply_mixup(mix_rng, images, labels, mixup_cfg)
        else:
            targets = one_hot_smooth(labels, num_classes, label_smoothing)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, apply_fn, images, targets, rng)
        return loss, grads

    def train_step(state: TrainState, images: Array, labels: Array, rng: Array
                   ) -> Tuple[TrainState, StepMetrics]:
        rng = jax.random.fold_in(rng, state.step)
        if accum_steps == 1:
            loss, grads = single_grad(state.params, state.apply_fn, rng,
                                      images, labels)
        else:
            mb = images.shape[0] // accum_steps
            images_mb = images.reshape(accum_steps, mb, *images.shape[1:])
            labels_mb = labels.reshape(accum_steps, mb, *labels.shape[1:])

            def body(carry, xs):
                loss_acc, grad_acc = carry
                im, lb, i = xs
                loss, grads = single_grad(
                    state.params, state.apply_fn,
                    jax.random.fold_in(rng, i), im, lb)
                return (loss_acc + loss,
                        jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (0.0, zero_grads),
                (images_mb, labels_mb, jnp.arange(accum_steps)))
            loss = loss / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        grad_norm = optax.global_norm(grads)
        if skip_nonfinite:
            new_state, skipped = apply_or_skip(state, grads, loss, grad_norm)
            return new_state, StepMetrics(loss=loss, grad_norm=grad_norm,
                                          skipped=skipped)
        new_state = state.apply_gradients(grads)
        return new_state, StepMetrics(loss=loss, grad_norm=grad_norm)

    return train_step


def make_vit_eval_step():
    """Top-1/top-5 evaluation step (``vit/engine.py:76-107``)."""

    def eval_step(params, apply_fn, images, labels):
        logits = apply_fn(params, images, deterministic=True)
        top1 = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        top5_pred = jax.lax.top_k(logits, min(5, logits.shape[-1]))[1]
        top5 = jnp.mean(
            jnp.any(top5_pred == labels[:, None], axis=-1).astype(jnp.float32))
        loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))
        return {"acc1": top1, "acc5": top5, "loss": loss}

    return eval_step
