"""Cross-replica consistency checks.

Replaces ``Trainer._check_grad_norms`` (``fairseq/trainer.py:1375-1412``):
in data-parallel training every replica must compute the same global grad
norm; divergence means desynced parameters or non-deterministic data.  Under
single-controller SPMD jit this holds by construction, so the check targets
(a) multi-process (``jax.distributed``) runs and (b) shard_map code paths
where per-shard reductions are hand-written.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def check_grad_norms_sharded(grad_norm: jax.Array, axis_name: str,
                             tol: float = 1e-4) -> jax.Array:
    """Inside shard_map/pmap: assert every replica computed the same norm.

    Returns a bool scalar (all-consistent); pair with
    ``jax.debug.print``/error handling at the call site.  Mirrors the
    reference's max-vs-min tolerance formula (``trainer.py:1399-1406``).
    """
    norms = jax.lax.all_gather(grad_norm, axis_name)
    max_n = jnp.max(norms)
    min_n = jnp.min(norms)
    denom = jnp.maximum(max_n, 1e-6)
    ok = ((max_n - min_n) / denom < tol) | jnp.isnan(max_n) | jnp.isinf(max_n)
    return ok


def fast_stat_sync_sum(stats: dict, axis_name: Optional[str] = None) -> dict:
    """Sum simple numeric stats across replicas
    (``trainer.py:_fast_stat_sync_sum``).  Inside shard_map use axis_name;
    outside, sums across processes via multihost utils when initialized."""
    if axis_name is not None:
        return {k: jax.lax.psum(v, axis_name) for k, v in stats.items()}
    try:
        from jax.experimental import multihost_utils

        if jax.process_count() > 1:
            arr = jnp.asarray(list(stats.values()), jnp.float32)
            summed = multihost_utils.process_allgather(arr).sum(axis=0)
            return {k: summed[i] for i, k in enumerate(stats)}
    except Exception:
        pass
    return stats
