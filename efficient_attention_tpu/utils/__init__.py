"""Aux utilities: NaN forensics, consistency checks, profiling."""
from efficient_attention_tpu.utils.consistency import (
    check_grad_norms_sharded,
    fast_stat_sync_sum,
)
from efficient_attention_tpu.utils.nan_detector import (
    NanDetector,
    debug_nans,
    first_nonfinite_leaf,
)
from efficient_attention_tpu.utils.profiling import (
    flop_count,
    profile_trace,
    step_scope,
    timed_throughput,
)

__all__ = [
    "NanDetector", "debug_nans", "first_nonfinite_leaf",
    "check_grad_norms_sharded", "fast_stat_sync_sum",
    "profile_trace", "step_scope", "flop_count", "timed_throughput",
]
