"""The efficient-attention zoo, flax.linen edition."""
from efficient_attention_tpu.attention.base import MASK_VAL, MultiheadAttention
from efficient_attention_tpu.attention.causal_eva import (
    CausalEVAttention,
    EvaDecodeState,
    reorder_decode_state,
)
from efficient_attention_tpu.attention.eva import EVA, T5RelativePositionBias
from efficient_attention_tpu.attention.kernelized import KernelizedAttention
from efficient_attention_tpu.attention.lara import LinearRA
from efficient_attention_tpu.attention.local import LocalAttention
from efficient_attention_tpu.attention.randomized import RandomizedAttention
from efficient_attention_tpu.attention.scatterbrain import ScatterBrain

__all__ = [
    "MASK_VAL",
    "MultiheadAttention",
    "LocalAttention",
    "KernelizedAttention",
    "RandomizedAttention",
    "LinearRA",
    "EVA",
    "T5RelativePositionBias",
    "CausalEVAttention",
    "EvaDecodeState",
    "reorder_decode_state",
    "ScatterBrain",
]
