"""Multi-host (multi-process) SPMD wiring.

The reference initializes torch.distributed process groups and hand-routes
NCCL collectives (``fairseq/distributed/utils.py:246-281``); the TPU-native
equivalent is one ``jax.distributed.initialize`` call after which
``jax.devices()`` is GLOBAL, every process runs the same jitted program,
and XLA emits the collectives.  Three things remain host-side:

  * bootstrapping the coordinator (this module),
  * feeding each process its local slice of the global batch
    (:func:`put_batch`),
  * gating logging/checkpoint-writing to the primary process.

Single-process runs are untouched: :func:`init_distributed` is a no-op
unless multi-process flags/env are present.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding


def add_distributed_args(parser):
    """CLI flags mirroring ``fairseq/distributed/utils.py`` env handling."""
    g = parser.add_argument_group("distributed")
    g.add_argument("--distributed", action="store_true", default=False,
                   help="initialize jax.distributed (multi-host SPMD)")
    g.add_argument("--coordinator-address", default=None, type=str,
                   help="host:port of process 0 (env JAX_COORDINATOR_ADDRESS)")
    g.add_argument("--num-processes", default=None, type=int,
                   help="world size (env JAX_NUM_PROCESSES)")
    g.add_argument("--process-id", default=None, type=int,
                   help="this process's rank (env JAX_PROCESS_ID)")
    return parser


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Any] = None,
) -> bool:
    """Initialize the JAX distributed runtime (idempotent).

    Arguments fall back to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``), and on managed TPU pods/SLURM clusters
    ``jax.distributed.initialize()`` auto-detects everything.  Returns True
    when a multi-process runtime was (or already is) initialized.
    """
    # NB: must not touch jax.devices()/process_count() before initialize —
    # that would initialize the XLA backend and make initialize() illegal.
    try:
        if jax.distributed.is_initialized():
            return jax.process_count() > 1
    except AttributeError:  # older jax
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return jax.process_count() > 1
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process run; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def init_distributed_from_args(args) -> bool:
    """CLI entry: only act when --distributed (or env) asks for it."""
    if not (getattr(args, "distributed", False)
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        return False
    return init_distributed(
        getattr(args, "coordinator_address", None),
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None),
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def put_batch(arr, sharding: NamedSharding):
    """Place one process-local batch slice into a GLOBAL sharded array.

    Single-process: a plain ``device_put``.  Multi-process: each process
    contributes its local rows via
    ``jax.make_array_from_process_local_data`` — the global batch dimension
    is ``process_count * local_batch``.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(arr))
    return jax.device_put(arr, sharding)
