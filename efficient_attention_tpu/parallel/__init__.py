"""Mesh + sharding: the TPU replacement for the reference's distributed stack."""
from efficient_attention_tpu.parallel.distributed import (
    add_distributed_args,
    init_distributed,
    init_distributed_from_args,
    is_primary,
    put_batch,
)
from efficient_attention_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_FSDP,
    AXIS_MODEL,
    AXIS_SEQ,
    batch_spec,
    infer_param_specs,
    make_mesh,
    shard_params,
)

__all__ = [
    "make_mesh", "batch_spec", "infer_param_specs", "shard_params",
    "AXIS_DATA", "AXIS_FSDP", "AXIS_MODEL", "AXIS_SEQ",
    "add_distributed_args", "init_distributed", "init_distributed_from_args",
    "is_primary", "put_batch",
]
