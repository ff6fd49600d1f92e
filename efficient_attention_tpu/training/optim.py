"""Optimizers + LR schedules (Optax), replacing ``fairseq/optim`` (4.1k LoC)
and the timm optimizer/scheduler factories used by ``vit/main.py:292-295``.

Schedules cover the three benchmark recipes:
  * cosine w/ warmup + t-mult restarts (LM recipe, ``main.sh:75-124``)
  * inverse-sqrt w/ warmup (MT recipe, ``main.sh:146-176``)
  * timm-style cosine-with-warmup epochs (DeiT recipe, ``README.md:104-145``)
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    warmup_init_lr: float = 1e-6,
    min_lr: float = 1e-5,
    steps_per_epoch: int = 0,
) -> optax.Schedule:
    """DeiT cosine schedule (timm ``CosineLRScheduler`` semantics used by
    ``vit/main.py``: linear warmup then single cosine to min_lr).

    Two timm fidelity details (round-4 trajectory-parity work):

    * ``t_in_epochs=True`` — DeiT steps the scheduler once per EPOCH
      (``vit/main.py`` ``lr_scheduler.step(epoch)``), so the lr is
      piecewise-constant across an epoch.  Pass ``steps_per_epoch`` to
      quantize; 0 keeps per-step interpolation (used by the LM/MT
      trainers' shared helper surface).
    * ``warmup_prefix=False`` (timm default, what ``create_scheduler``
      builds) — the cosine phase's progress counts from t=0 INCLUDING
      the warmup region (``lr = min + 0.5*(base-min)*(1+cos(pi *
      t/t_initial))``), so the curve resumes mid-cosine after warmup
      rather than restarting at the peak.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if steps_per_epoch:
            step = jnp.floor(step / steps_per_epoch) * steps_per_epoch
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * (
            step / jnp.maximum(warmup_steps, 1))
        progress = jnp.clip(step / jnp.maximum(total_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def step_schedule(
    base_lr: float,
    warmup_steps: int,
    decay_steps: int,
    decay_rate: float = 0.1,
    warmup_init_lr: float = 1e-6,
) -> optax.Schedule:
    """timm ``StepLRScheduler`` (``vit/main.py --sched step``): linear
    warmup, then lr * decay_rate every ``decay_steps``."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * (
            step / jnp.maximum(warmup_steps, 1))
        n = jnp.floor(step / jnp.maximum(decay_steps, 1))
        decayed = base_lr * decay_rate ** n
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def cosine_tmult_schedule(
    base_lr: float,
    warmup_steps: int,
    period: int,
    t_mult: float = 2.0,
    min_lr: float = 1e-9,
    warmup_init_lr: float = 1e-7,
    lr_shrink: float = 1.0,
    max_steps: int = 1_000_000,
) -> optax.Schedule:
    """fairseq ``cosine`` scheduler with period multiplier (LM recipe:
    ``--lr-scheduler cosine --t-mult 2 --lr-period-updates 270000
    --lr-shrink 0.75``, ``main.sh:75-124``).  Restart boundaries are
    precomputed statically; both max and min lr shrink by
    ``lr_shrink**i`` in period ``i``
    (``fairseq/optim/lr_scheduler/cosine_lr_scheduler.py:137-140``)."""
    boundaries = []
    start, length = 0, period
    while start < max_steps:
        boundaries.append((start, length))
        start += length
        length = int(length * t_mult)
    starts = jnp.asarray([b[0] for b in boundaries], jnp.float32)
    lens = jnp.asarray([b[1] for b in boundaries], jnp.float32)
    shrinks = jnp.asarray([lr_shrink ** i for i in range(len(boundaries))],
                          jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * (
            step / jnp.maximum(warmup_steps, 1))
        t = jnp.maximum(step - warmup_steps, 0.0)
        idx = jnp.sum(t >= starts) - 1
        idx = jnp.clip(idx, 0, len(boundaries) - 1)
        frac = (t - starts[idx]) / lens[idx]
        lo = min_lr * shrinks[idx]
        hi = base_lr * shrinks[idx]
        cos = lo + 0.5 * (hi - lo) * (1 + jnp.cos(math.pi * frac))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def inverse_sqrt_schedule(
    base_lr: float,
    warmup_steps: int,
    warmup_init_lr: float = 1e-7,
) -> optax.Schedule:
    """fairseq ``inverse_sqrt`` (MT recipe: lr 7e-4, warmup 6000)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * (
            step / jnp.maximum(warmup_steps, 1))
        decay = base_lr * jnp.sqrt(warmup_steps / jnp.maximum(step, 1))
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def polynomial_schedule(base_lr, warmup_steps, total_steps, power=1.0,
                        end_lr=0.0):
    """fairseq ``polynomial_decay``."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        frac = jnp.clip(
            (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1),
            0.0, 1.0)
        dec = (base_lr - end_lr) * frac**power + end_lr
        return jnp.where(step < warmup_steps, warm, dec)
    return schedule


def tri_stage_schedule(base_lr: float, warmup_steps: int, hold_steps: int,
                       decay_steps: int, init_lr_scale: float = 0.01,
                       final_lr_scale: float = 0.01) -> optax.Schedule:
    """fairseq ``tri_stage`` scheduler: linear warmup, hold, exp decay."""
    init_lr = base_lr * init_lr_scale
    final_lr = base_lr * final_lr_scale

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + (base_lr - init_lr) * step / jnp.maximum(warmup_steps, 1)
        t = step - warmup_steps - hold_steps
        decay = base_lr * jnp.exp(
            jnp.log(jnp.maximum(final_lr_scale, 1e-9))
            * jnp.clip(t / jnp.maximum(decay_steps, 1), 0.0, 1.0))
        return jnp.where(
            step < warmup_steps, warm,
            jnp.where(step < warmup_steps + hold_steps, base_lr, decay))

    return schedule


class ReduceLROnPlateau:
    """fairseq ``reduce_lr_on_plateau``: host-side stateful factor schedule.
    Call ``.step(val_loss)`` per validation; multiply into the base schedule
    via ``.scale``."""

    def __init__(self, factor: float = 0.1, patience: int = 1,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, val_loss: float) -> float:
        if val_loss < self.best * (1 - self.threshold):
            self.best = val_loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


def weight_decay_mask(params) -> Any:
    """timm ``add_weight_decay`` grouping exactly (what DeiT's
    ``create_optimizer`` builds): no decay for params with ndim <= 1
    (biases, LayerNorm weights), ``.bias`` leaves, and the model's
    ``no_weight_decay()`` skip set — which for the reference is ONLY
    ``{pos_embed, cls_token}`` (``efficient_vit.py:205``).  RPE tables
    are 2-D and not in the skip set, so the reference DOES decay them;
    excluding them here was a measured trajectory-parity drift (round
    4)."""

    def decide(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        leafname = names[-1] if names else ""
        if leafname in ("bias",):
            return False
        if leafname == "scale":  # LayerNorm scale (ndim 1 in torch)
            return False
        if any(n in ("pos_embed", "cls_token") for n in names):
            return False
        return leaf.ndim >= 2

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [decide(p, l) for p, l in flat])


def _fairseq_nag(schedule: optax.Schedule, momentum: float = 0.99,
                 weight_decay: float = 0.0,
                 mask: Any = None) -> optax.GradientTransformation:
    """Faithful fairseq NAG (``fairseq/optim/nag.py:72-109``).

    Differs from ``optax.sgd(nesterov=True)`` in two ways that matter
    under the wiki103 cosine schedule:

    * the momentum buffer is kept in PARAMETER units (``buf ->
      momentum*lr_correct*buf - lr*g``) and rescaled by ``lr_correct =
      lr/lr_old`` whenever the schedule moves, so accumulated momentum
      shrinks with the lr; optax's trace is in gradient units and only
      the CURRENT step's lr scales it,
    * weight decay is decoupled multiplicative (``p *= 1 - lr*wd``
      before the momentum/grad terms), never entering the buffer.

    With a constant lr the two coincide (``buf == -lr * trace``).
    """

    def init(params):
        return {
            "buf": jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, jnp.float32), params),
            "count": jnp.zeros((), jnp.int32),
            # sentinel: the first step uses lr_correct = 1 (the reference
            # reads ``group.get('lr_old', lr)``)
            "lr_old": jnp.full((), -1.0, jnp.float32),
        }

    def update(updates, state, params=None):
        if weight_decay and params is None:
            raise ValueError("fairseq NAG with weight decay needs params")
        lr = jnp.asarray(schedule(state["count"]), jnp.float32)
        lr_old = state["lr_old"]
        lr_correct = jnp.where(
            lr_old < 0, 1.0,
            jnp.where(lr_old > 0, lr / jnp.where(lr_old > 0, lr_old, 1.0),
                      lr))

        def leaf(g, buf, p, decay):
            g = g.astype(jnp.float32)
            delta = (momentum * momentum * lr_correct) * buf \
                - ((1 + momentum) * lr) * g
            if weight_decay and decay:
                delta = delta - (lr * weight_decay) * p.astype(jnp.float32)
            new_buf = (momentum * lr_correct) * buf - lr * g
            return delta.astype(g.dtype), new_buf

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_b = treedef.flatten_up_to(state["buf"])
        flat_p = (treedef.flatten_up_to(params) if params is not None
                  else [None] * len(flat_u))
        flat_m = (treedef.flatten_up_to(mask) if mask is not None
                  else [True] * len(flat_u))
        out = [leaf(g, b, p, m)
               for g, b, p, m in zip(flat_u, flat_b, flat_p, flat_m)]
        deltas = treedef.unflatten([o[0] for o in out])
        bufs = treedef.unflatten([o[1] for o in out])
        new_state = {"buf": bufs, "count": state["count"] + 1,
                     "lr_old": lr}
        return deltas, new_state

    return optax.GradientTransformation(init, update)


def _fairseq_adam(schedule: optax.Schedule, betas=(0.9, 0.999),
                  eps: float = 1e-8, weight_decay: float = 0.0,
                  mask: Any = None) -> optax.GradientTransformation:
    """Faithful fairseq Adam (``fairseq/optim/adam.py:159-241``).

    Differs from ``optax.adamw`` in the epsilon placement: the reference
    adds eps to ``sqrt(v)`` of the UNcorrected second moment and then
    scales the whole step by ``sqrt(1-b2^t)/(1-b1^t)`` — i.e. the
    effective floor is ``eps/sqrt(1-b2^t)`` (7x eps at step 1 for
    b2=0.98), where optax floors the corrected ``sqrt(v_hat)`` at eps.
    Negligible for healthy gradients but a systematic per-step relative
    drift on near-zero-gradient coordinates, which the MT trajectory
    parity (Adam beta2 0.98, 60 steps) resolves.  Weight decay is
    decoupled (``p.add_(p, alpha=-wd*lr)``), as in the reference.
    """
    b1, b2 = betas

    def init(params):
        z = lambda p: jnp.zeros_like(p, jnp.float32)  # noqa: E731
        return {"m": jax.tree_util.tree_map(z, params),
                "v": jax.tree_util.tree_map(z, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        if weight_decay and params is None:
            raise ValueError("fairseq Adam with weight decay needs params")
        count = state["count"] + 1
        lr = jnp.asarray(schedule(state["count"]), jnp.float32)
        t = count.astype(jnp.float32)
        step_size = lr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)

        def leaf(g, m, v, p, decay):
            g = g.astype(jnp.float32)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * (g * g)
            delta = -step_size * m / (jnp.sqrt(v) + eps)
            if weight_decay and decay:
                delta = delta - (weight_decay * lr) * p.astype(jnp.float32)
            return delta.astype(g.dtype), m, v

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state["m"])
        flat_v = treedef.flatten_up_to(state["v"])
        flat_p = (treedef.flatten_up_to(params) if params is not None
                  else [None] * len(flat_u))
        flat_d = (treedef.flatten_up_to(mask) if mask is not None
                  else [True] * len(flat_u))
        out = [leaf(g, m, v, p, dec) for g, m, v, p, dec
               in zip(flat_u, flat_m, flat_v, flat_p, flat_d)]
        new_state = {"m": treedef.unflatten([o[1] for o in out]),
                     "v": treedef.unflatten([o[2] for o in out]),
                     "count": count}
        return treedef.unflatten([o[0] for o in out]), new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    name: str,
    schedule: optax.Schedule,
    weight_decay: float = 0.05,
    clip_grad: Optional[float] = None,
    params_for_mask: Any = None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    momentum: float = 0.99,
) -> optax.GradientTransformation:
    """Optimizer factory (registry analogue of ``fairseq/optim/__init__.py``
    + timm ``create_optimizer``).  Supported: adamw, adam, nag, sgd,
    adafactor, adagrad, adadelta, adamax, lamb."""
    chain = []
    if clip_grad is not None and clip_grad > 0:
        chain.append(optax.clip_by_global_norm(clip_grad))
    mask = (weight_decay_mask(params_for_mask)
            if params_for_mask is not None else None)
    if name == "adamw":
        chain.append(optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                                 weight_decay=weight_decay, mask=mask))
    elif name == "adam":
        # fairseq's Adam applies DECOUPLED (AdamW-style) weight decay
        # (``fairseq/optim/adam.py:229-231``: p.add_(p, alpha=-wd*lr) outside
        # the moment update) and floors the UNcorrected sqrt(v) at eps —
        # the faithful form, pinned by the MT trajectory parity.
        chain.append(_fairseq_adam(schedule, betas=betas, eps=eps,
                                   weight_decay=weight_decay, mask=mask))
    elif name == "nag":
        # fairseq NAG (LM recipe: ``--optimizer nag --lr 1.0``) — NOT
        # optax's nesterov SGD: fairseq's momentum buffer is kept in
        # PARAMETER units (lr-premultiplied) and rescaled by lr/lr_old
        # when the schedule moves, and weight decay is decoupled
        # multiplicative (``fairseq/optim/nag.py:92-104``).  Under a
        # constant lr the two coincide (buf = -lr * trace); under cosine
        # they do not — trajectory parity (round 4) requires the faithful
        # form.
        chain.append(_fairseq_nag(schedule, momentum=momentum,
                                  weight_decay=weight_decay, mask=mask))
    elif name == "sgd":
        chain.append(optax.sgd(schedule, momentum=momentum))
    elif name == "adafactor":
        chain.append(optax.adafactor(schedule))
    elif name == "adagrad":
        chain.append(optax.adagrad(schedule))
    elif name == "adadelta":
        chain.append(optax.adadelta(schedule))
    elif name == "adamax":
        chain.append(optax.adamax(schedule, b1=betas[0], b2=betas[1]))
    elif name == "lamb":
        chain.append(optax.lamb(schedule, weight_decay=weight_decay, mask=mask))
    else:
        raise NotImplementedError(f"optimizer {name}")
    return optax.chain(*chain)
