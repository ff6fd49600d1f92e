"""Training substrate: TrainState, optimizers/schedules, metrics, checkpoints."""
from efficient_attention_tpu.training.checkpoint import (
    CheckpointManager,
    average_checkpoints,
)
from efficient_attention_tpu.training.metrics import MetricLogger, SmoothedValue
from efficient_attention_tpu.training.optim import (
    cosine_schedule,
    cosine_tmult_schedule,
    inverse_sqrt_schedule,
    make_optimizer,
    polynomial_schedule,
    weight_decay_mask,
)
from efficient_attention_tpu.training.train_state import (
    StepMetrics,
    TrainState,
    make_vit_eval_step,
    make_vit_train_step,
)

__all__ = [
    "TrainState", "StepMetrics", "make_vit_train_step", "make_vit_eval_step",
    "cosine_schedule", "cosine_tmult_schedule", "inverse_sqrt_schedule",
    "polynomial_schedule", "make_optimizer", "weight_decay_mask",
    "MetricLogger", "SmoothedValue", "CheckpointManager", "average_checkpoints",
]
