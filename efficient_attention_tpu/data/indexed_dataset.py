"""Memory-mapped binarized corpus format.

Replaces ``fairseq/data/indexed_dataset.py``'s ``MMapIndexedDataset``
(``indexed_dataset.py:391-558``): a ``.bin`` of concatenated token arrays
plus a ``.idx`` with dtype code and per-sequence lengths/offsets.  Layout is
our own (simpler header) but serves the same role: zero-copy random access
to millions of variable-length sequences for the MT/LM loaders.
"""
from __future__ import annotations

import struct
from typing import List, Sequence

import numpy as np

_MAGIC = b"EATPUIDX"
_DTYPES = {1: np.uint16, 2: np.int32, 3: np.int64}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


class MMapIndexedDatasetBuilder:
    def __init__(self, path_prefix: str, dtype=np.int32):
        self.prefix = path_prefix
        self.dtype = np.dtype(dtype)
        self._bin = open(path_prefix + ".bin", "wb")
        self.lengths: List[int] = []

    def add_item(self, tokens: np.ndarray) -> None:
        arr = np.asarray(tokens, dtype=self.dtype)
        self._bin.write(arr.tobytes(order="C"))
        self.lengths.append(len(arr))

    def finalize(self) -> None:
        self._bin.close()
        lengths = np.asarray(self.lengths, dtype=np.int64)
        with open(self.prefix + ".idx", "wb") as f:
            f.write(_MAGIC)
            f.write(struct.pack("<BQ", _DTYPE_CODES[self.dtype], len(lengths)))
            f.write(lengths.tobytes(order="C"))


class MMapIndexedDataset:
    """Zero-copy random access over a binarized corpus."""

    def __init__(self, path_prefix: str):
        with open(path_prefix + ".idx", "rb") as f:
            magic = f.read(len(_MAGIC))
            assert magic == _MAGIC, f"bad index file for {path_prefix}"
            dtype_code, n = struct.unpack("<BQ", f.read(9))
            self.lengths = np.frombuffer(f.read(8 * n), dtype=np.int64)
        self.dtype = _DTYPES[dtype_code]
        self.offsets = np.concatenate(
            [[0], np.cumsum(self.lengths)]).astype(np.int64)
        self._data = np.memmap(path_prefix + ".bin", dtype=self.dtype,
                               mode="r")

    def __len__(self):
        return len(self.lengths)

    def __getitem__(self, i: int) -> np.ndarray:
        return np.asarray(
            self._data[self.offsets[i]: self.offsets[i + 1]], dtype=np.int64)

    @property
    def sizes(self) -> np.ndarray:
        return self.lengths

    def flat_tokens(self) -> np.ndarray:
        """The whole corpus as one token stream (for TokenBlockDataset)."""
        return np.asarray(self._data, dtype=np.int64)


def binarize_file(text_path: str, dictionary, out_prefix: str,
                  append_eos: bool = True, dtype=np.int32) -> dict:
    """Binarize a tokenized text file (``fairseq_cli/preprocess.py`` +
    ``fairseq/binarizer.py`` equivalent).  Returns stats."""
    builder = MMapIndexedDatasetBuilder(out_prefix, dtype=dtype)
    n_tok = 0
    n_unk = 0
    n_seq = 0
    with open(text_path, encoding="utf-8") as f:
        for line in f:
            ids = dictionary.encode_line(line, append_eos=append_eos)
            n_unk += int((ids == dictionary.unk()).sum())
            n_tok += len(ids)
            n_seq += 1
            builder.add_item(ids)
    builder.finalize()
    return {"sequences": n_seq, "tokens": n_tok, "unk": n_unk}
