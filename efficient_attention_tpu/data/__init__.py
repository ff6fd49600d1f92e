"""Data pipelines: on-device augmentation, samplers, text datasets."""
from efficient_attention_tpu.data.mixup import (
    MixupConfig,
    apply_mixup,
    one_hot_smooth,
    soft_target_cross_entropy,
)

__all__ = [
    "MixupConfig", "apply_mixup", "one_hot_smooth", "soft_target_cross_entropy",
]
