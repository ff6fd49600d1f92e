"""LM/MT dataset assembly: token blocks, language pairs, token-budget batching.

Replaces ``fairseq/data/token_block_dataset.py`` (+ its Cython fast path
``token_block_utils_fast.pyx``), ``language_pair_dataset.py`` and the
``batch_by_size`` machinery (``data_utils_fast.pyx``).  TPU-first deltas:
batches are padded to fixed bucket shapes so XLA compiles a handful of
programs instead of one per shape; block slicing is vectorized numpy over
the flat mmap token stream (no per-example Python).

A C++ implementation of the hot packing loop lives in ``native/`` and is
used automatically when built (see ``native.py``).
"""
from __future__ import annotations

import math
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class TokenBlockDataset:
    """Slice a flat token stream into fixed-size LM blocks
    (``TokenBlockDataset`` 'none' break-mode, the wiki103 recipe's
    ``--tokens-per-sample 512``)."""

    def __init__(self, tokens: np.ndarray, block_size: int, pad_idx: int = 1):
        self.tokens = tokens
        self.block_size = block_size
        self.pad_idx = pad_idx
        self.n_blocks = max(1, math.ceil(len(tokens) / block_size))

    def __len__(self):
        return self.n_blocks

    def __getitem__(self, i: int) -> np.ndarray:
        start = i * self.block_size
        block = self.tokens[start: start + self.block_size]
        if len(block) < self.block_size:
            block = np.concatenate([
                block,
                np.full(self.block_size - len(block), self.pad_idx,
                        dtype=block.dtype)])
        return block

    @property
    def sizes(self):
        return np.full(self.n_blocks, self.block_size, dtype=np.int64)


class LanguagePairDataset:
    """Paired source/target with eos handling
    (``fairseq/data/language_pair_dataset.py`` essentials)."""

    def __init__(self, src, tgt, pad_idx=1, eos_idx=2):
        assert len(src) == len(tgt)
        self.src, self.tgt = src, tgt
        self.pad_idx, self.eos_idx = pad_idx, eos_idx

    def __len__(self):
        return len(self.src)

    def __getitem__(self, i):
        return self.src[i], self.tgt[i]

    @property
    def src_sizes(self):
        return self.src.sizes

    @property
    def tgt_sizes(self):
        return self.tgt.sizes


def batch_by_size(
    indices: np.ndarray,
    sizes: np.ndarray,
    max_tokens: int,
    max_sentences: Optional[int] = None,
    required_multiple: int = 8,
) -> List[np.ndarray]:
    """Token-budget batch packing (``data_utils_fast.pyx:batch_by_size_*``).

    Greedy packing over (usually length-sorted) indices: a batch closes when
    adding the next item would exceed ``max_tokens`` (with padding to the
    batch max length) or ``max_sentences``.  Batch sizes are trimmed to a
    multiple of ``required_multiple`` where possible (TPU-friendly shapes).
    """
    try:
        from efficient_attention_tpu.native import batch_by_size_native

        return batch_by_size_native(indices, sizes, max_tokens, max_sentences,
                                    required_multiple)
    except Exception:
        pass
    batches = []
    cur: List[int] = []
    cur_max = 0
    for idx in indices:
        size = int(sizes[idx])
        new_max = max(cur_max, size)
        if cur and (
            new_max * (len(cur) + 1) > max_tokens
            or (max_sentences and len(cur) >= max_sentences)
        ):
            keep = len(cur)
            if keep > required_multiple:
                keep -= keep % required_multiple
            batches.append(np.asarray(cur[:keep]))
            cur = cur[keep:]
            cur_max = max((int(sizes[i]) for i in cur), default=0)
        cur.append(idx)
        cur_max = max(cur_max, size)
    if cur:
        batches.append(np.asarray(cur))
    return batches


def _bucket_length(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def collate_tokens(
    samples: Sequence[np.ndarray],
    pad_idx: int,
    pad_to_length: Optional[int] = None,
    pad_to_multiple: int = 8,
    move_eos_to_beginning: bool = False,
    eos_idx: int = 2,
) -> np.ndarray:
    """Right-pad a list of 1-D arrays into [B, T]
    (``fairseq/data/data_utils.py:collate_tokens``); optionally build
    ``prev_output_tokens`` by rotating eos to the front."""
    max_len = max(len(s) for s in samples)
    if pad_to_length:
        max_len = max(max_len, pad_to_length)
    max_len = int(math.ceil(max_len / pad_to_multiple) * pad_to_multiple)
    out = np.full((len(samples), max_len), pad_idx, dtype=np.int64)
    for i, s in enumerate(samples):
        if move_eos_to_beginning:
            out[i, 0] = eos_idx
            out[i, 1:len(s)] = s[:-1]
        else:
            out[i, :len(s)] = s
    return out


class EpochBatchIterator:
    """Checkpointable, shardable epoch iterator
    (``fairseq/data/iterators.py:EpochBatchIterator`` essentials: length
    sorting, token-budget batches, deterministic shuffling by epoch seed,
    shard slicing for data parallelism, resumable position)."""

    def __init__(self, dataset, max_tokens: int, collate_fn,
                 max_sentences: Optional[int] = None, seed: int = 1,
                 num_shards: int = 1, shard_id: int = 0,
                 sort_by_length: bool = True):
        self.dataset = dataset
        self.max_tokens = max_tokens
        self.max_sentences = max_sentences
        self.collate_fn = collate_fn
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.sort_by_length = sort_by_length
        self.epoch = 0
        self._next_batch = 0

    def _sizes(self):
        if hasattr(self.dataset, "src_sizes"):
            return np.maximum(self.dataset.src_sizes, self.dataset.tgt_sizes)
        return self.dataset.sizes

    def _batches_for_epoch(self, epoch: int) -> List[np.ndarray]:
        rng = np.random.default_rng(self.seed + epoch)
        sizes = self._sizes()
        order = rng.permutation(len(self.dataset))
        if self.sort_by_length:
            order = order[np.argsort(sizes[order], kind="stable")]
        batches = batch_by_size(order, sizes, self.max_tokens,
                                self.max_sentences)
        rng.shuffle(batches)
        return batches[self.shard_id::self.num_shards]

    def __len__(self):
        return len(self._batches_for_epoch(self.epoch))

    def next_epoch_itr(self) -> Iterator:
        self.epoch += 1
        start = self._next_batch
        self._next_batch = 0
        batches = self._batches_for_epoch(self.epoch)

        def gen():
            for i in range(start, len(batches)):
                self._next_batch = i + 1
                yield self.collate_fn([self.dataset[j] for j in batches[i]])
            self._next_batch = 0

        return gen()

    def state_dict(self):
        return {"epoch": self.epoch, "next_batch": self._next_batch,
                "seed": self.seed}

    def load_state_dict(self, state):
        self.seed = state.get("seed", self.seed)
        if state["next_batch"] > 0:
            # resume mid-epoch: next_epoch_itr will re-enter the same epoch
            # at the saved batch offset
            self.epoch = state["epoch"] - 1
            self._next_batch = state["next_batch"]
        else:
            self.epoch = state["epoch"]
            self._next_batch = 0
