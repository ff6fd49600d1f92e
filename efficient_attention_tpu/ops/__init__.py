"""Functional numerics layer: windows, random features, log ops, pooling, RPE."""
from efficient_attention_tpu.ops import (
    edit_distance,
    log_ops,
    pooling,
    random_features,
    rpe,
    windows,
)

__all__ = ["windows", "random_features", "log_ops", "pooling", "rpe",
           "edit_distance"]
