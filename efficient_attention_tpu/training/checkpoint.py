"""Orbax checkpointing of the unified TrainState.

Replaces ``fairseq/checkpoint_utils.py`` (857 LoC) + ``vit/main.py:355-363``:
best/last/interval/keep-last policies, async writes, full-state resume, and
checkpoint averaging (``scripts/average_checkpoints.py``, used by the MT
recipe ``main.sh:160-164``).
"""
from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin policy wrapper over ``ocp.CheckpointManager``."""

    def __init__(
        self,
        directory: str,
        keep_last: int = 3,
        save_interval_steps: int = 1,
        async_save: bool = True,
        best_fn: Optional[str] = None,  # metric name to rank checkpoints by
        best_mode: Optional[str] = None,  # 'max' | 'min'; inferred if None
    ):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        if best_fn and best_mode is None:
            # loss-like metric names rank lower-is-better
            lowered = best_fn.lower()
            best_mode = ("min" if any(tok in lowered for tok in
                                      ("loss", "ppl", "perplexity", "nll",
                                       "error", "wer"))
                         else "max")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_last,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=async_save,
            best_fn=(lambda m: m[best_fn]) if best_fn else None,
            best_mode=best_mode or "max",
        )
        self.manager = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self.manager.save(
            int(step), args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()} or None)

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def restore_params(self, step: Optional[int] = None):
        """Restore ONLY the model parameters, ignoring optimizer state.

        Inference CLIs (eval_lm/generate) don't know the training
        optimizer, so a full-TrainState template would impose the wrong
        opt_state structure; the raw restore sidesteps the template
        entirely (fairseq likewise loads just ``state['model']`` at
        inference).  Returns ``(step, params)`` or ``None``.
        """
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        raw = self.manager.restore(step)
        params = raw["params"] if isinstance(raw, dict) and "params" in raw \
            else raw
        return step, params

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()


def prune_layer_params(params: Any, layers_to_keep, scope: str,
                       prefix: str = "layer_") -> Any:
    """Keep only the listed transformer layers of one scope and renumber
    them densely — the LayerDrop inference-time pruning of fairseq's
    ``prune_state_dict`` (``checkpoint_utils.py:674``, "Reducing
    Transformer Depth on Demand"): a model trained with layerdrop can be
    evaluated with any subset of its layers, so ``--decoder-layers-to-keep
    0,2,4`` loads a 3-layer model from a full-depth checkpoint.

    ``params`` is a flax param pytree (with or without the outer
    ``{"params": ...}`` wrapper); ``scope`` is the submodule holding the
    ``layer_{i}`` children (``"decoder"`` / ``"encoder"``).
    """
    keep = sorted(int(i) for i in layers_to_keep)
    root = dict(params)
    tree = root
    if "params" in tree:
        root["params"] = tree = dict(tree["params"])
    if scope not in tree:
        raise KeyError(f"scope {scope!r} not in checkpoint "
                       f"(has {sorted(tree)})")
    sub = dict(tree[scope])
    old_layers = {k for k in sub if k.startswith(prefix)}
    for i in keep:
        if f"{prefix}{i}" not in old_layers:
            raise ValueError(
                f"layer {i} not in checkpoint ({len(old_layers)} layers)")
    pruned = {k: v for k, v in sub.items() if k not in old_layers}
    for new_i, old_i in enumerate(keep):
        pruned[f"{prefix}{new_i}"] = sub[f"{prefix}{old_i}"]
    tree[scope] = pruned
    return root


def maybe_prune_for_keep(params: Any, layers_to_keep, scope: str,
                         prefix: str = "layer_") -> Any:
    """Apply :func:`prune_layer_params` only when the checkpoint is
    deeper than the requested subset — fairseq's ``prune_state_dict``
    runs on *every* checkpoint load (``checkpoint_utils.py:674``),
    including ``--finetune-from-model`` warm starts, but is a no-op on a
    checkpoint that was already saved at the pruned depth."""
    if not layers_to_keep:
        return params
    tree = params.get("params", params) if isinstance(params, dict) \
        else params
    sub = tree.get(scope, {}) if isinstance(tree, dict) else {}
    n_ckpt = sum(1 for k in sub if str(k).startswith(prefix))
    if n_ckpt == len(list(layers_to_keep)):
        return params
    return prune_layer_params(params, layers_to_keep, scope, prefix)


def parse_layers_to_keep(spec: Optional[str]):
    """``"0,2,4"`` -> [0, 2, 4]; None/'' -> None (fairseq's
    ``--encoder-layers-to-keep`` / ``--decoder-layers-to-keep`` format)."""
    if not spec:
        return None
    return [int(x) for x in str(spec).replace(" ", "").split(",") if x != ""]


def average_checkpoints(states: List[Any]) -> Any:
    """Uniform parameter averaging over N restored param pytrees
    (``scripts/average_checkpoints.py`` — the MT recipe averages the last 10
    checkpoints before generation, ``main.sh:160-164``)."""
    n = len(states)
    assert n > 0
    def avg(*xs):
        if not hasattr(xs[0], "dtype"):
            return xs[0]
        acc = sum(np.asarray(x, dtype=np.float64) for x in xs) / n
        return acc.astype(xs[0].dtype)

    return jax.tree_util.tree_map(avg, *states)
