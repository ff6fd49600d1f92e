"""Pipeline parallelism: GPipe-style microbatched stage execution.

Replaces the reference's torch Pipe-based pipeline parallelism
(``fairseq/model_parallel/models/pipeline_parallel_transformer/`` +
``--pipeline-model-parallel`` configs, ``fairseq/dataclass/configs.py:365-423``)
the TPU way: stages live on a ``stage`` mesh axis inside ``shard_map``;
activations move between neighbor stages with ``lax.ppermute`` over ICI; the
schedule is the classic GPipe loop of ``num_microbatches + num_stages - 1``
ticks, expressed as ``lax.scan`` with rotating buffers — fully jittable,
no host round-trips.

Works with any per-stage function ``stage_fn(stage_params, x) -> x`` where
``stage_params`` is this stage's shard of a stacked-layer pytree (stack your
L layers as leading-dim-L arrays and shard that dim over ``stage``).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

Array = jax.Array


def pipeline_run(
    stage_fn: Callable[[Any, Array], Array],
    stage_params: Any,  # this stage's params (already sharded)
    microbatches: Array,  # [num_micro, mb, ...] this stage holds the full set
    axis_name: str = "stage",
    rng: Any = None,
) -> Array:
    """Run inside shard_map: GPipe forward over the stage axis.

    Stage 0 feeds microbatches in order; stage ``S-1``'s outputs are collected.
    Returns ``[num_micro, mb, ...]`` (valid on the last stage; callers
    typically ``psum``/select).  Total ticks = num_micro + num_stages - 1.
    With ``rng``, ``stage_fn`` is called as ``stage_fn(params, x, tick_rng)``
    (a distinct fold per schedule tick — dropout support).
    """
    n_stages = jax.lax.axis_size(axis_name)
    stage_id = jax.lax.axis_index(axis_name)
    num_micro = microbatches.shape[0]
    mb_shape = microbatches.shape[1:]
    ticks = num_micro + n_stages - 1

    def tick(carry, t):
        state, outputs = carry
        # stage 0 ingests microbatch t (when available), others take the
        # activation passed from the left neighbor
        feed = jax.lax.dynamic_index_in_dim(
            microbatches, jnp.clip(t, 0, num_micro - 1), axis=0,
            keepdims=False)
        x = jnp.where(stage_id == 0, feed, state)
        if rng is None:
            y = stage_fn(stage_params, x)
        else:
            y = stage_fn(stage_params, x, jax.random.fold_in(rng, t))
        # last stage records its result for microbatch (t - n_stages + 1)
        out_idx = jnp.clip(t - (n_stages - 1), 0, num_micro - 1)
        record = (stage_id == n_stages - 1) & (t >= n_stages - 1)
        updated = jax.lax.dynamic_update_index_in_dim(outputs, y, out_idx,
                                                      axis=0)
        outputs = jnp.where(record, updated, outputs)
        # shift activations right: stage i -> stage i+1
        nxt = jax.lax.ppermute(
            y, axis_name,
            perm=[(i, (i + 1) % n_stages) for i in range(n_stages)])
        return (nxt, outputs), None

    # promote carries to stage-varying so shard_map's vma typing accepts
    # per-stage divergence inside the scan
    init_state = jax.lax.pvary(jnp.zeros(mb_shape, microbatches.dtype),
                               (axis_name,))
    init_out = jax.lax.pvary(jnp.zeros_like(microbatches), (axis_name,))
    (_, outputs), _ = jax.lax.scan(
        tick, (init_state, init_out), jnp.arange(ticks))
    return outputs


def make_pipelined_apply(
    layer_fn: Callable[[Any, Array], Array],
    mesh: Mesh,
    axis_name: str = "stage",
    layers_per_stage: int = 1,
):
    """Build a jittable pipelined apply for a stack of identical layers.

    ``layer_fn(params_i, x) -> x`` applies ONE layer; layer params must be
    stacked on the leading axis (L = stages * layers_per_stage) and sharded
    ``P(axis_name)`` over the mesh.  Data enters as ``[num_micro, mb, ...]``
    replicated; output is the last stage's result, broadcast to all stages.
    """

    def stage_fn(stage_params, x):
        def body(x, params_i):
            return layer_fn(params_i, x), None

        x, _ = jax.lax.scan(lambda c, p: (layer_fn(p, c), None),
                            x, stage_params)
        return x

    def pipelined(stacked_params, microbatches):
        out = pipeline_run(stage_fn, stacked_params, microbatches, axis_name)
        # replicate the last stage's outputs to every stage: all-gather and
        # select the final stage's copy
        n = jax.lax.axis_size(axis_name)
        gathered = jax.lax.all_gather(out, axis_name)  # [n, num_micro, ...]
        return gathered[n - 1]

    return jax.jit(jax.shard_map(
        pipelined, mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    ))


def make_pipelined_train_step(
    layer_fn: Callable[[Any, Array], Array],
    loss_fn: Callable[[Array, Array], Array],
    optimizer,
    mesh: Mesh,
    axis_name: str = "stage",
    embed_fn: Callable[[Any, Array], Array] = None,
    head_fn: Callable[[Any, Array], Array] = None,
    head_takes_embed: bool = False,
):
    """GPipe TRAINING step over a stage mesh axis.

    The backward schedule comes for free: ``pipeline_run`` is built from
    ``lax.scan`` + ``lax.ppermute`` + selects, all of which are linear/
    differentiable — ``jax.grad`` through the shard_mapped forward yields
    the reverse pipeline (activations flow left, cotangents flow right),
    which is exactly GPipe's fill/drain backward.  This replaces the
    reference's torch Pipe training integration
    (``fairseq/model_parallel/models/pipeline_parallel_transformer/model.py``).

    Args:
      layer_fn: ``(params_i, x) -> x`` for ONE transformer layer; layer
        params stacked on a leading L axis, sharded ``P(axis_name)``.
      loss_fn: ``(last_stage_out [num_micro, mb, ...], targets) -> scalar``.
      optimizer: an optax GradientTransformation over
        ``(stacked_params, embed_params, head_params)``.
      embed_fn/head_fn: optional replicated pre/post computation (token
        embedding on entry, LM head on exit), run outside the stage loop —
        matching the reference's embed-on-first / head-on-last placement
        without pinning them to a stage.
      head_takes_embed: ``head_fn(head_p, embed_p, h)`` — for heads tied to
        the input embedding (``share_input_output_embed``), so the shared
        table stays ONE parameter leaf and its gradient sums both uses.

    Returns ``(init_opt_state_fn, train_step)`` where
    ``train_step(params3, opt_state, micro_x, micro_tgt[, rng]) ->
    (params3, opt_state, loss)`` is fully jitted.  Passing an ``rng``
    requires ``layer_fn``/``embed_fn`` to accept a trailing rng arg
    (dropout); it is folded per-stage, per-tick, and per-layer so no two
    dropout masks repeat.
    """
    embed_fn = embed_fn or (lambda p, x: x)
    head_fn = head_fn or (lambda p, x: x)

    def stage_fn(stage_params, x, rng=None):
        if rng is None:
            x, _ = jax.lax.scan(lambda c, p: (layer_fn(p, c), None),
                                x, stage_params)
            return x
        n_local = jax.tree_util.tree_leaves(stage_params)[0].shape[0]

        def body(c, xs):
            p, i = xs
            return layer_fn(p, c, jax.random.fold_in(rng, i)), None

        x, _ = jax.lax.scan(body, x, (stage_params, jnp.arange(n_local)))
        return x

    def inner_loss(stacked, embed_p, head_p, micro_x, micro_tgt, rng=None):
        if rng is None:
            h = embed_fn(embed_p, micro_x)
            out = pipeline_run(stage_fn, stacked, h, axis_name)
        else:
            # distinct dropout per stage: fold this stage's index
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            h = embed_fn(embed_p, micro_x, jax.random.fold_in(rng, 997))
            out = pipeline_run(stage_fn, stacked, h, axis_name, rng=rng)
        n = jax.lax.axis_size(axis_name)
        gathered = jax.lax.all_gather(out, axis_name)[n - 1]
        if head_takes_embed:
            return loss_fn(head_fn(head_p, embed_p, gathered), micro_tgt)
        return loss_fn(head_fn(head_p, gathered), micro_tgt)

    sharded_loss = jax.shard_map(
        inner_loss, mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    sharded_loss_rng = jax.shard_map(
        inner_loss, mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss_of(params3, micro_x, micro_tgt, rng):
        stacked, embed_p, head_p = params3
        if rng is None:
            return sharded_loss(stacked, embed_p, head_p, micro_x, micro_tgt)
        return sharded_loss_rng(stacked, embed_p, head_p, micro_x, micro_tgt,
                                rng)

    @jax.jit
    def train_step(params3, opt_state, micro_x, micro_tgt, rng=None):
        loss, grads = jax.value_and_grad(loss_of)(params3, micro_x,
                                                  micro_tgt, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params3)
        params3 = optax.apply_updates(params3, updates)
        return params3, opt_state, loss

    return optimizer.init, train_step
