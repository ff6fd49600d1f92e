"""Generation: beam search + greedy decoding over pytree decode states."""
from efficient_attention_tpu.generation.beam_search import (
    SequenceGenerator,
    greedy_decode,
)

__all__ = ["SequenceGenerator", "greedy_decode"]
