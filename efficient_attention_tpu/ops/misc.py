"""Misc attention utilities (``attn_utils.py`` parity).

Note: the reference's ``look_around`` and ``Merger`` (``attn_utils.py:33,
116``) are defined but consumed by NOTHING in the reference itself (its
local attention does halos via unfold, its poolers via adaptive_avg_pool),
so they are intentionally not reproduced here; ``ops/windows.py`` is this
repo's halo mechanism.
"""
from __future__ import annotations

import numpy as np


def future_mask(n: int) -> np.ndarray:
    """Static upper-triangular causal mask of -inf above the diagonal
    (``attn_utils.fill_with_neg_inf`` + ``buffered_future_mask`` — static
    shapes make the buffering unnecessary under jit)."""
    mask = np.zeros((n, n), np.float32)
    mask[np.triu_indices(n, 1)] = -np.inf
    return mask
