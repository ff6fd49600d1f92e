"""Sliding-context LM evaluation blocks.

Replaces ``fairseq/data/lm_context_window_dataset.py`` +
``fairseq_cli/eval_lm.py:244-246``: with ``--context-window c`` the effective
block advance shrinks to ``tokens_per_sample - c`` and each block carries the
previous ``c`` tokens as (unscored) context, so every scored token sees at
least ``c`` tokens of history.
"""
from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np


def context_window_blocks(
    tokens: np.ndarray,
    tokens_per_sample: int,
    context_window: int = 0,
    pad_idx: int = 1,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yields ``(block [tokens_per_sample], score_mask [tokens_per_sample])``.

    ``block[t]`` predicts ``block[t+1]``-style targets are built by the
    caller; ``score_mask`` marks positions whose NEXT-token prediction is
    counted (context positions and padding are excluded).
    """
    n = len(tokens)
    stride = tokens_per_sample - context_window
    assert stride > 0, "context window must be smaller than tokens_per_sample"
    start = 0
    first = True
    while start < n:
        if first:
            block = tokens[:tokens_per_sample]
            scored_from = 0
            next_start = len(block)
            first = False
        else:
            ctx_start = start - context_window
            block = tokens[ctx_start: ctx_start + tokens_per_sample]
            scored_from = context_window
            next_start = start + stride
        mask = np.zeros(tokens_per_sample, bool)
        mask[scored_from: len(block)] = True
        if len(block) < tokens_per_sample:
            block = np.concatenate([
                block,
                np.full(tokens_per_sample - len(block), pad_idx,
                        dtype=tokens.dtype)])
        yield block, mask
        start = next_start
