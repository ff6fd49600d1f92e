"""Device mesh + sharding rules — the TPU-native replacement for the
reference's entire distributed substrate.

The reference's c10d/NCCL process groups, DDP wrappers, FSDP, Megatron TP and
pipeline configs (``fairseq/distributed/*``, ``fairseq/model_parallel/*``,
SURVEY §2.3) collapse here into ONE device mesh with named axes and sharding
rules consumed by ``jax.jit``:

  * ``data``  — data parallel (replaces pytorch_ddp / legacy_ddp / BMUF)
  * ``fsdp``  — parameter/optimizer-state sharding (replaces fully_sharded /
    ``--zero-sharding os``); folded into ``data`` for gradients
  * ``model`` — tensor parallel (replaces fairseq/model_parallel Megatron TP)
  * ``seq``   — sequence/context parallel for window+chunk attention (the
    idiomatic extension the reference lacks, SURVEY §2.3 item 7)

Collectives are emitted by XLA from sharding constraints (psum for grads,
all-gather for TP activations) and ride ICI.
"""
from __future__ import annotations

import math
import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_MODEL = "model"
AXIS_SEQ = "seq"


def make_mesh(
    n_devices: Optional[int] = None,
    data: int = -1,
    fsdp: int = 1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a 4-axis mesh; ``data=-1`` absorbs the remaining devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    fixed = fsdp * model * seq
    if data == -1:
        assert n % fixed == 0, f"{n} devices not divisible by {fixed}"
        data = n // fixed
    assert data * fixed == n, (data, fsdp, model, seq, n)
    dev_array = np.asarray(devices).reshape(data, fsdp, model, seq)
    return Mesh(dev_array, (AXIS_DATA, AXIS_FSDP, AXIS_MODEL, AXIS_SEQ))


def batch_spec() -> P:
    """Inputs: shard the batch over (data, fsdp)."""
    return P((AXIS_DATA, AXIS_FSDP))


# ---------------------------------------------------------------------------
# Parameter sharding rules.
#
# Megatron-style TP for transformer layers (replaces
# fairseq/model_parallel/modules/{multihead_attention,transformer_layer}.py):
#   * qkv / mlp-in kernels: shard output dim over 'model' (column parallel)
#   * proj / mlp-out kernels: shard input dim over 'model' (row parallel)
#   * embeddings / heads: shard vocab/class dim over 'model'
# FSDP: shard the largest remaining dim over 'fsdp'.
# ---------------------------------------------------------------------------

_COLUMN_PARALLEL = re.compile(
    r"(qkv|q_proj|k_proj|v_proj|fc1|wi|mlp.*layers_0|GatedMlp.*Dense_0|Dense_0)"
)
_ROW_PARALLEL = re.compile(
    r"(out_proj|(^|/)proj(/|$)|fc2|wo|GatedMlp.*Dense_1|Dense_1)")
_EMBED = re.compile(r"(embed_tokens|pos_embed|head|output_projection)")


def _rule_for(path: str, shape: Tuple[int, ...], use_fsdp: bool, use_tp: bool) -> P:
    ndim = len(shape)
    if ndim == 0:
        return P()
    spec: list = [None] * ndim
    if use_tp and ndim >= 2 and "experts" in path:
        # BASE-layer expert stacks: shard the leading expert axis over
        # 'model' (expert parallelism; XLA inserts the all-to-alls around
        # the dense [E, k, D] routed block — see models/base_layer.py)
        spec[0] = AXIS_MODEL
    elif use_tp and ndim >= 2:
        if _COLUMN_PARALLEL.search(path):
            spec[-1] = AXIS_MODEL
        elif _ROW_PARALLEL.search(path):
            spec[-2] = AXIS_MODEL
        elif _EMBED.search(path):
            spec[-1] = AXIS_MODEL
    if use_fsdp:
        # shard the largest not-yet-sharded dim over fsdp
        order = sorted(range(ndim), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % 2 == 0 and shape[i] >= 16:
                spec[i] = AXIS_FSDP
                break
    return P(*spec)


def infer_param_specs(params, use_fsdp: bool = True, use_tp: bool = True):
    """PartitionSpec pytree for a param pytree, by path-regex rules."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in flat:
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
        specs.append(_rule_for(path_str, leaf.shape, use_fsdp, use_tp))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh, use_fsdp: bool = True, use_tp: bool = True):
    """Device-put params with inferred shardings."""
    specs = infer_param_specs(params, use_fsdp, use_tp)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings), specs
